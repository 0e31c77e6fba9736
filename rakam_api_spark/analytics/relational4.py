"""Round-11 relational additions over the star schema: calendar-mix,
purchase-cadence, balance/revenue decile, return-rate-trend, markup
and cross-region-flow reports — BI shapes the reference serves
through its warehouse SQL (reference README.md:17,27-31; SURVEY.md
§2.7), re-expressed as declarative DataFrame plans.

Determinism conventions match relational.py: money/quantity
aggregates on DECIMAL (exact); every ratio is a single double
division of exact operands (or rounded identically on both engines);
every ordering ends in a unique key; day-of-week is integer date
arithmetic anchored on a known Monday (1970-01-05) because Spark's
and DuckDB's native dow functions disagree on week start.

Scale notes: nothing here windows over raw fact rows — the only
windows are ntile/rank PARTITIONED by market segment over
per-customer AGGREGATE rows (the ``customer_gini_by_segment``
precedent: segments are an enum, the partition input is already
reduced by one groupBy).  Shares are computed with the
``mix_weights`` idiom: aggregate to a domain-bounded cell table, a
second aggregate OF THOSE cells broadcast back — never a global
window over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table, table_rowcount
from .relational import DEC, _dec
from .relational2 import _VOL_SQL, _vol

_MONDAY = "1970-01-05"  # a known Monday: dow = days-since mod 7 + 1


def _dow(col):
    day = col.cast("date")
    return (
        (F.datediff(day, F.lit(_MONDAY).cast("date")) % 7 + 7) % 7 + 1
    ).cast("int")


def order_weekday_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order volume and value by (day-of-week × priority), with each
    priority's share of its weekday — the ops-calendar report behind
    staffing and SLA planning (which priorities dominate Mondays?).

    Plan: one partial-aggregatable groupBy to a ≤ 7×5-cell table;
    weekday totals are an aggregate OF THOSE cells joined back
    (broadcast-sized by construction).  Value sums are DECIMAL; the
    share is one double division of exact counts."""
    orders = load_table(spark, sf_dir, "orders")
    cell = orders.groupBy(
        _dow(F.col("o_orderdate")).alias("dow"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).alias("_val"),
    )
    daytot = cell.groupBy("dow").agg(F.sum("n_orders").alias("_day_n"))
    return (
        cell.join(F.broadcast(daytot), "dow")
        .select(
            "dow",
            "priority",
            "n_orders",
            F.col("_val").cast("double").alias("total_value"),
            F.round(
                F.col("n_orders").cast("double") / F.col("_day_n").cast("double"),
                9,
            ).alias("share_of_day"),
        )
        .orderBy("dow", "priority")
    )


ORDER_WEEKDAY_MIX_ORACLE = """
WITH cell AS (
  SELECT CAST(((date_diff('day', DATE '1970-01-05', CAST(o_orderdate AS DATE))
                % 7 + 7) % 7 + 1) AS INT) AS dow,
         o_orderpriority AS priority,
         COUNT(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS _val
  FROM orders GROUP BY 1, 2
),
daytot AS (SELECT dow, SUM(n_orders) AS _day_n FROM cell GROUP BY 1)
SELECT c.dow, c.priority, CAST(c.n_orders AS BIGINT) AS n_orders,
       CAST(c._val AS DOUBLE) AS total_value,
       round(CAST(c.n_orders AS DOUBLE) / CAST(d._day_n AS DOUBLE), 9)
         AS share_of_day
FROM cell c JOIN daytot d USING (dow)
ORDER BY dow, priority
"""


def customer_interpurchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-cadence profile per market segment: how long between
    a repeat customer's orders.  A customer's MEAN gap needs no
    window at all — consecutive gaps telescope, so mean = (last −
    first) / (n − 1) in exact integer days; the segment rollup
    reports the POOLED mean (Σ span / Σ gaps — one double division
    of exact integers) and the min/max per-customer mean (min/max
    over bit-identical doubles, deterministic) rather than an
    order-dependent double average.

    Plan: one per-customer aggregate, a customer-dim join, one
    segment rollup — zero windows, zero fact-row shuffles beyond the
    custkey aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.datediff(
                F.max(F.col("o_orderdate").cast("date")),
                F.min(F.col("o_orderdate").cast("date")),
            ).alias("span_days"),
        )
        .where(F.col("n_orders") >= 3)
    )
    mean_gap = F.col("span_days").cast("double") / (
        F.col("n_orders") - F.lit(1)
    ).cast("double")
    j = per_cust.join(
        customer, per_cust["o_custkey"] == customer["c_custkey"]
    )
    return (
        j.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_repeat_customers"),
            F.sum("span_days").alias("_span"),
            F.sum(F.col("n_orders") - F.lit(1)).alias("_gaps"),
            F.round(F.min(mean_gap), 9).alias("min_mean_gap_days"),
            F.round(F.max(mean_gap), 9).alias("max_mean_gap_days"),
        )
        .select(
            "segment",
            "n_repeat_customers",
            F.round(
                F.col("_span").cast("double") / F.col("_gaps").cast("double"), 9
            ).alias("pooled_mean_gap_days"),
            "min_mean_gap_days",
            "max_mean_gap_days",
        )
        .orderBy("segment")
    )


INTERPURCHASE_GAPS_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey,
         COUNT(*) AS n_orders,
         date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                   MAX(CAST(o_orderdate AS DATE))) AS span_days
  FROM orders GROUP BY 1 HAVING COUNT(*) >= 3
)
SELECT c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_repeat_customers,
       round(CAST(SUM(span_days) AS DOUBLE)
             / CAST(SUM(n_orders - 1) AS DOUBLE), 9) AS pooled_mean_gap_days,
       round(MIN(CAST(span_days AS DOUBLE) / CAST(n_orders - 1 AS DOUBLE)), 9)
         AS min_mean_gap_days,
       round(MAX(CAST(span_days AS DOUBLE) / CAST(n_orders - 1 AS DOUBLE)), 9)
         AS max_mean_gap_days
FROM per_cust JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY 1
"""


def acctbal_decile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-balance decile table per market segment: the
    distribution profile (n, min, max, mean per decile) credit teams
    read instead of raw quantiles — ntile ranks are identical across
    engines once the order is total, where engine-specific quantile
    INTERPOLATION is not.

    Plan: the only window is ntile PARTITIONED BY SEGMENT over
    customer-dim rows (already one row per customer); means divide a
    DECIMAL sum by an exact count."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    d = customer.withColumn("decile", F.ntile(10).over(w))
    return (
        d.groupBy(F.col("c_mktsegment").alias("segment"), "decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("c_acctbal"), 6).alias("min_balance"),
            F.round(F.max("c_acctbal"), 6).alias("max_balance"),
            F.round(
                F.sum(_dec("c_acctbal")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("avg_balance"),
        )
        .orderBy("segment", "decile")
    )


ACCTBAL_DECILE_ORACLE = """
WITH d AS (
  SELECT c_mktsegment, c_acctbal,
         ntile(10) OVER (PARTITION BY c_mktsegment
                         ORDER BY c_acctbal, c_custkey) AS decile
  FROM customer
)
SELECT c_mktsegment AS segment, decile,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       round(MIN(c_acctbal), 6) AS min_balance,
       round(MAX(c_acctbal), 6) AS max_balance,
       round(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 9) AS avg_balance
FROM d GROUP BY 1, 2 ORDER BY 1, 2
"""


def brand_return_rate_quarterly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate trend by brand × ship quarter: the share of
    shipped quantity that came back flagged 'R' — the
    quality-regression tripwire behind the reference's returned-item
    reporting (the trend view of TPC-H Q10's snapshot).

    Plan: one part-dim join (dimension side is broadcast-sized; AQE
    chooses), one partial-aggregatable groupBy to brand×quarter
    cells.  Quantities are DECIMAL sums; the rate is one double
    division."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    quarter = F.date_trunc("quarter", F.col("l_shipdate")).cast("date")
    j = li.join(part, li["l_partkey"] == part["p_partkey"])
    cell = j.groupBy(
        F.col("p_brand").alias("brand"), quarter.alias("quarter")
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(_dec("l_quantity")).alias("_qty"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", _dec("l_quantity")).otherwise(
                F.lit(0).cast(DEC)
            )
        ).alias("_rqty"),
    )
    return cell.select(
        "brand",
        "quarter",
        "n_items",
        F.col("_qty").cast("double").alias("total_qty"),
        F.round(
            F.col("_rqty").cast("double") / F.col("_qty").cast("double"), 9
        ).alias("return_rate"),
    ).orderBy("brand", "quarter")


BRAND_RETURN_RATE_ORACLE = """
SELECT p_brand AS brand,
       CAST(date_trunc('quarter', l_shipdate) AS DATE) AS quarter,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty,
       round(CAST(SUM(CASE WHEN l_returnflag = 'R'
                           THEN CAST(l_quantity AS DECIMAL(18,6))
                           ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 9)
         AS return_rate
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


def retail_markup_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realized markup over catalog price by part type: how actual
    line revenue compares to quantity × retail price — the pricing-
    discipline report (aggregate ratio of exact DECIMAL sums, plus
    the per-item extremes).

    Determinism: each row's markup is ONE double division of exact
    decimal operands (bit-identical across engines), so min/max pick
    identical values; the aggregate markup divides two exact DECIMAL
    sums once."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li["l_partkey"] == part["p_partkey"])
    base = _dec("l_quantity") * _dec("p_retailprice")
    row_markup = _dec("l_extendedprice").cast("double") / base.cast("double")
    g = j.groupBy(F.col("p_type").alias("part_type")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(_dec("l_extendedprice")).alias("_ext"),
        F.sum(base).alias("_base"),
        F.round(F.min(row_markup), 9).alias("min_item_markup"),
        F.round(F.max(row_markup), 9).alias("max_item_markup"),
    )
    return g.select(
        "part_type",
        "n_items",
        F.round(
            F.col("_ext").cast("double") / F.col("_base").cast("double"), 9
        ).alias("aggregate_markup"),
        "min_item_markup",
        "max_item_markup",
    ).orderBy("part_type")


RETAIL_MARKUP_ORACLE = """
WITH j AS (
  SELECT p_type,
         CAST(l_extendedprice AS DECIMAL(18,6)) AS ext,
         CAST(l_quantity AS DECIMAL(18,6))
           * CAST(p_retailprice AS DECIMAL(18,6)) AS base
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT p_type AS part_type,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       round(CAST(SUM(ext) AS DOUBLE) / CAST(SUM(base) AS DOUBLE), 9)
         AS aggregate_markup,
       round(MIN(CAST(ext AS DOUBLE) / CAST(base AS DOUBLE)), 9)
         AS min_item_markup,
       round(MAX(CAST(ext AS DOUBLE) / CAST(base AS DOUBLE)), 9)
         AS max_item_markup
FROM j GROUP BY 1 ORDER BY 1
"""


#: auto switch to the two-pass decile cut past this many customers —
#: below it the per-segment window sort is cheap; above it a single
#: task sorting customers/|segments| rows becomes the bottleneck
_TWOPASS_DECILE_MIN_ROWS = 5_000_000


def _twopass_deciles(j: DataFrame, n_buckets: int = 10) -> DataFrame:
    """Exact per-segment ``ntile(n_buckets)`` over ``(_spend,
    c_custkey)`` WITHOUT a single-task per-segment sort (VERDICT r11
    What's wrong #2): range-repartition on the full sort tuple, count
    rows per (range partition, segment) — a partitions×segments
    METADATA aggregate — derive each partition's per-segment rank
    offset on the driver, then global rank = offset + row_number
    within the (partition, segment) slice (each such slice is bounded
    by one range partition, so every sort stays partition-local).
    The bucket follows from exact ntile arithmetic — the first
    ``n % k`` buckets take ``ceil(n/k)`` rows — so the result is
    bit-identical to ``ntile()`` while scaling to ~1B customers.

    ``localCheckpoint`` pins the ranged partitioning so the counting
    pass and the ranking pass see the SAME partition assignment."""
    spark = j.sparkSession
    nparts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    ranged = (
        j.repartitionByRange(nparts, "c_mktsegment", "_spend", "c_custkey")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = ranged.groupBy("_pid", "c_mktsegment").count().collect()
    by_seg: dict = {}
    for r in counts:
        by_seg.setdefault(r["c_mktsegment"], []).append((r["_pid"], r["count"]))
    rows = []
    for seg, lst in by_seg.items():
        lst.sort()
        total = sum(c for _, c in lst)
        off = 0
        for pid, c in lst:
            rows.append((pid, seg, off, total))
            off += c
    meta = spark.createDataFrame(
        rows, "_pid int, c_mktsegment string, _off long, _n long"
    )
    w = Window.partitionBy("_pid", "c_mktsegment").orderBy("_spend", "c_custkey")
    ranked = (
        ranged.withColumn("_lr", F.row_number().over(w))
        .join(F.broadcast(meta), ["_pid", "c_mktsegment"])
        .withColumn("_rank", F.col("_off") + F.col("_lr"))
    )
    q = F.floor(F.col("_n") / n_buckets)
    rem = F.col("_n") % n_buckets
    big = rem * (q + F.lit(1))  # rows covered by the first rem buckets
    bucket = F.when(
        F.col("_rank") <= big,
        F.floor((F.col("_rank") - 1) / (q + F.lit(1))) + 1,
    ).otherwise(  # only reachable when q >= 1 (rank > big implies it)
        rem + F.floor((F.col("_rank") - big - 1) / q) + 1
    )
    return ranked.withColumn("decile", bucket.cast("int")).drop(
        "_pid", "_lr", "_off", "_n", "_rank"
    )


def customer_decile_revenue_share(
    spark: SparkSession, sf_dir: str, two_pass: bool | None = None
) -> DataFrame:
    """Revenue concentration by spend decile within each market
    segment: rank customers by exact total spend, cut into deciles,
    report each decile's revenue share of its segment — the
    "how much do the top 10% carry" table (the decile-resolution
    companion to ``customer_gini_by_segment``'s single index).

    Plan: one orderkey-grain join + per-customer DECIMAL aggregate,
    then the decile cut over those reduced rows; segment totals
    aggregate the ≤ |segments|×10 cells and join back
    broadcast-sized.  ``two_pass=None`` picks the cut strategy by
    customer count: the segment-partitioned ``ntile`` window below
    ``_TWOPASS_DECILE_MIN_ROWS`` (5 segments → a bounded single-task
    sort), else the rank-offset two-pass (:func:`_twopass_deciles`),
    which keeps every sort partition-local at ~1B customers and is
    bit-identical by construction."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    per_cust = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.sum(_vol()).alias("_spend"))
    )
    j = per_cust.join(
        customer, per_cust["o_custkey"] == customer["c_custkey"]
    )
    if two_pass is None:
        # footer-metadata count, memoized process-wide — the auto
        # gate must not cost an eager full-scan job per invocation
        two_pass = (
            table_rowcount(spark, sf_dir, "customer")
            >= _TWOPASS_DECILE_MIN_ROWS
        )
    if two_pass:
        d = _twopass_deciles(j, 10)
    else:
        w = Window.partitionBy("c_mktsegment").orderBy("_spend", "c_custkey")
        d = j.withColumn("decile", F.ntile(10).over(w))
    seg = d.groupBy(F.col("c_mktsegment").alias("segment"), "decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("_spend").alias("_rev"),
    )
    segtot = seg.groupBy("segment").agg(F.sum("_rev").alias("_seg_tot"))
    return (
        seg.join(F.broadcast(segtot), "segment")
        .select(
            "segment",
            "decile",
            "n_customers",
            F.col("_rev").cast("double").alias("revenue"),
            F.round(
                F.col("_rev").cast("double") / F.col("_seg_tot").cast("double"),
                9,
            ).alias("share_of_segment"),
        )
        .orderBy("segment", "decile")
    )


CUSTOMER_DECILE_SHARE_ORACLE = f"""
WITH per_cust AS (
  SELECT o_custkey, SUM({_VOL_SQL}) AS _spend
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1
),
d AS (
  SELECT c_mktsegment, _spend,
         ntile(10) OVER (PARTITION BY c_mktsegment
                         ORDER BY _spend, c_custkey) AS decile
  FROM per_cust JOIN customer ON o_custkey = c_custkey
),
seg AS (
  SELECT c_mktsegment AS segment, decile,
         COUNT(*) AS n_customers, SUM(_spend) AS _rev
  FROM d GROUP BY 1, 2
),
segtot AS (SELECT segment, SUM(_rev) AS _seg_tot FROM seg GROUP BY 1)
SELECT s.segment, s.decile, CAST(s.n_customers AS BIGINT) AS n_customers,
       CAST(s._rev AS DOUBLE) AS revenue,
       round(CAST(s._rev AS DOUBLE) / CAST(t._seg_tot AS DOUBLE), 9)
         AS share_of_segment
FROM seg s JOIN segtot t USING (segment)
ORDER BY segment, decile
"""


def region_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-region trade flows: revenue by (customer region ×
    supplier region) with each flow's share of world trade — the
    region-grain matrix behind TPC-H Q7/Q8's nation-pair questions
    (and the region-level rollup of ``nation_trade_balance``).

    Plan: fact rows join two TINY dim chains (customer→nation→region
    and supplier→nation→region — broadcast-sized; AQE chooses), one
    groupBy to a ≤ 5×5 cell table; the world total aggregates those
    cells and joins back as one row."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust_region = (
        customer.join(nation, customer["c_nationkey"] == nation["n_nationkey"])
        .join(region, nation["n_regionkey"] == region["r_regionkey"])
        .select(F.col("c_custkey"), F.col("r_name").alias("cust_region"))
    )
    supp_region = (
        supplier.join(nation, supplier["s_nationkey"] == nation["n_nationkey"])
        .join(region, nation["n_regionkey"] == region["r_regionkey"])
        .select(F.col("s_suppkey"), F.col("r_name").alias("supp_region"))
    )
    flows = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust_region, F.col("o_custkey") == cust_region["c_custkey"])
        .join(supp_region, li["l_suppkey"] == supp_region["s_suppkey"])
    )
    cell = flows.groupBy("cust_region", "supp_region").agg(
        F.count(F.lit(1)).alias("n_items"), F.sum(_vol()).alias("_rev")
    )
    total = cell.agg(F.sum("_rev").alias("_world"))
    return (
        cell.crossJoin(F.broadcast(total))
        .select(
            "cust_region",
            "supp_region",
            "n_items",
            F.col("_rev").cast("double").alias("revenue"),
            F.round(
                F.col("_rev").cast("double") / F.col("_world").cast("double"), 9
            ).alias("share_of_world"),
        )
        .orderBy("cust_region", "supp_region")
    )


REGION_TRADE_ORACLE = f"""
WITH cr AS (
  SELECT c_custkey, r_name AS cust_region
  FROM customer JOIN nation ON c_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
),
sr AS (
  SELECT s_suppkey, r_name AS supp_region
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
),
cell AS (
  SELECT cust_region, supp_region,
         COUNT(*) AS n_items, SUM({_VOL_SQL}) AS _rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                JOIN cr ON o_custkey = c_custkey
                JOIN sr ON l_suppkey = s_suppkey
  GROUP BY 1, 2
),
world AS (SELECT SUM(_rev) AS _world FROM cell)
SELECT cust_region, supp_region, CAST(n_items AS BIGINT) AS n_items,
       CAST(_rev AS DOUBLE) AS revenue,
       round(CAST(_rev AS DOUBLE) / CAST(_world AS DOUBLE), 9)
         AS share_of_world
FROM cell, world
ORDER BY cust_region, supp_region
"""


def lineitem_field_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlations between lineitem measures — (quantity,
    discount), (quantity, extendedprice), (discount, extendedprice) —
    the dependence screen behind pricing analyses (is discount
    actually tied to volume?).  A NEW aggregate class for the engine:
    exact-moment correlation.

    Determinism: all five moments per pair (n, Σx, Σy, Σx², Σy², Σxy)
    are EXACT DECIMAL sums in one partial-aggregatable pass; each
    moment casts to double once (correctly-rounded in both engines)
    and the Pearson formula is an identical double chain, rounded to
    9.  One aggregate row — no second pass, no window."""
    li = load_table(spark, sf_dir, "lineitem")
    q, d, p = _dec("l_quantity"), _dec("l_discount"), _dec("l_extendedprice")
    big = "decimal(38,12)"
    agg = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("sq"),
        F.sum(d).alias("sd"),
        F.sum(p).alias("sp"),
        F.sum((q * q).cast(big)).alias("sqq"),
        F.sum((d * d).cast(big)).alias("sdd"),
        F.sum((p * p).cast(big)).alias("spp"),
        F.sum((q * d).cast(big)).alias("sqd"),
        F.sum((q * p).cast(big)).alias("sqp"),
        F.sum((d * p).cast(big)).alias("sdp"),
    )

    def _r(sx, sy, sxx, syy, sxy):
        n = F.col("n").cast("double")
        ax, ay = F.col(sx).cast("double"), F.col(sy).cast("double")
        axx, ayy = F.col(sxx).cast("double"), F.col(syy).cast("double")
        axy = F.col(sxy).cast("double")
        return F.round(
            (n * axy - ax * ay)
            / F.sqrt((n * axx - ax * ax) * (n * ayy - ay * ay)),
            9,
        )

    return agg.select(
        F.col("n"),
        _r("sq", "sd", "sqq", "sdd", "sqd").alias("r_quantity_discount"),
        _r("sq", "sp", "sqq", "spp", "sqp").alias("r_quantity_price"),
        _r("sd", "sp", "sdd", "spp", "sdp").alias("r_discount_price"),
    )


LINEITEM_CORR_ORACLE = """
WITH m AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sq,
         SUM(CAST(l_discount AS DECIMAL(18,6))) AS sd,
         SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS sp,
         SUM(CAST(CAST(l_quantity AS DECIMAL(28,6))
                  * CAST(l_quantity AS DECIMAL(28,6)) AS DECIMAL(38,12))) AS sqq,
         SUM(CAST(CAST(l_discount AS DECIMAL(28,6))
                  * CAST(l_discount AS DECIMAL(28,6)) AS DECIMAL(38,12))) AS sdd,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,6))
                  * CAST(l_extendedprice AS DECIMAL(28,6)) AS DECIMAL(38,12))) AS spp,
         SUM(CAST(CAST(l_quantity AS DECIMAL(28,6))
                  * CAST(l_discount AS DECIMAL(28,6)) AS DECIMAL(38,12))) AS sqd,
         SUM(CAST(CAST(l_quantity AS DECIMAL(28,6))
                  * CAST(l_extendedprice AS DECIMAL(28,6)) AS DECIMAL(38,12))) AS sqp,
         SUM(CAST(CAST(l_discount AS DECIMAL(28,6))
                  * CAST(l_extendedprice AS DECIMAL(28,6)) AS DECIMAL(38,12))) AS sdp
  FROM lineitem
)
SELECT CAST(n AS BIGINT) AS n,
       round((CAST(n AS DOUBLE) * CAST(sqd AS DOUBLE)
              - CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                     - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                       - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))), 9)
         AS r_quantity_discount,
       round((CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE)
              - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                     - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                       - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))), 9)
         AS r_quantity_price,
       round((CAST(n AS DOUBLE) * CAST(sdp AS DOUBLE)
              - CAST(sd AS DOUBLE) * CAST(sp AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                     - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                       - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))), 9)
         AS r_discount_price
FROM m
"""


def order_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lines-per-order distribution: how many orders have 1, 2, …
    lineitems, with each size's share — the order-shape profile
    behind batching and picking economics (the distribution version
    of ``order_composition_trend``'s averages).

    Two partial-aggregatable groupBys (order grain, then size grain)
    and a broadcast-back total — all exact integers, one double
    division for the share."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    cell = per_order.groupBy("n_lines").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    total = cell.agg(F.sum("n_orders").alias("_tot"))
    return (
        cell.crossJoin(F.broadcast(total))
        .select(
            "n_lines",
            "n_orders",
            F.round(
                F.col("n_orders").cast("double") / F.col("_tot").cast("double"),
                9,
            ).alias("share_of_orders"),
        )
        .orderBy("n_lines")
    )


ORDER_SIZE_HIST_ORACLE = """
WITH per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem GROUP BY 1
),
cell AS (SELECT n_lines, COUNT(*) AS n_orders FROM per_order GROUP BY 1),
tot AS (SELECT SUM(n_orders) AS _tot FROM cell)
SELECT CAST(n_lines AS BIGINT) AS n_lines,
       CAST(n_orders AS BIGINT) AS n_orders,
       round(CAST(n_orders AS DOUBLE) / CAST(_tot AS DOUBLE), 9)
         AS share_of_orders
FROM cell, tot ORDER BY n_lines
"""


def part_size_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog pricing by physical size band: parts bucketed into
    10-unit ``p_size`` bands with count, retail-price stats and each
    band's share of total catalog value — the assortment-structure
    report ("is the value in the small parts or the big ones?").

    Plan: one partial-aggregatable groupBy of the part dim to ≤ 5
    band cells; the value total aggregates THOSE cells and attaches
    broadcast-sized.  Price sums are DECIMAL; min/max/share are
    exact-operand doubles."""
    part = load_table(spark, sf_dir, "part")
    band = (F.floor((F.col("p_size") - 1) / 10)).cast("int")
    cell = part.groupBy(band.alias("size_band")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(_dec("p_retailprice")).alias("_val"),
        F.min(_dec("p_retailprice")).alias("_min"),
        F.max(_dec("p_retailprice")).alias("_max"),
    )
    tot = cell.agg(F.sum("_val").alias("_tot"))
    return (
        cell.crossJoin(F.broadcast(tot))
        .select(
            "size_band",
            (F.col("size_band") * 10 + 1).alias("size_from"),
            (F.col("size_band") * 10 + 10).alias("size_to"),
            "n_parts",
            F.round(
                F.col("_val").cast("double") / F.col("n_parts").cast("double"), 9
            ).alias("avg_retail"),
            F.col("_min").cast("double").alias("min_retail"),
            F.col("_max").cast("double").alias("max_retail"),
            F.round(
                F.col("_val").cast("double") / F.col("_tot").cast("double"), 9
            ).alias("value_share"),
        )
        .orderBy("size_band")
    )


PART_SIZE_BANDS_ORACLE = """
WITH cell AS (
  SELECT CAST(floor((p_size - 1) / 10) AS INT) AS size_band,
         COUNT(*) AS n_parts,
         SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS _val,
         MIN(CAST(p_retailprice AS DECIMAL(18,6))) AS _min,
         MAX(CAST(p_retailprice AS DECIMAL(18,6))) AS _max
  FROM part GROUP BY 1
),
tot AS (SELECT SUM(_val) AS _tot FROM cell)
SELECT size_band,
       CAST(size_band * 10 + 1 AS BIGINT) AS size_from,
       CAST(size_band * 10 + 10 AS BIGINT) AS size_to,
       CAST(n_parts AS BIGINT) AS n_parts,
       round(CAST(_val AS DOUBLE) / CAST(n_parts AS DOUBLE), 9) AS avg_retail,
       CAST(_min AS DOUBLE) AS min_retail,
       CAST(_max AS DOUBLE) AS max_retail,
       round(CAST(_val AS DOUBLE) / CAST(_tot AS DOUBLE), 9) AS value_share
FROM cell, tot ORDER BY size_band
"""


def nation_type_specialization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply specialization per supplier nation: the part TYPE each
    nation earns the most revenue supplying, with that type's share
    of the nation's supply revenue and the nation's type diversity —
    the comparative-advantage table behind sourcing strategy.

    Plan: the fact scan joins two broadcast-sized dim chains
    (supplier→nation, part), reduces ONCE to (nation, type) cells;
    the argmax ranks within nations over those ≤ |nations|×|types|
    cells (never fact rows), ties broken by type name for a total
    order."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    cell = (
        li.join(supplier, li["l_suppkey"] == supplier["s_suppkey"])
        .join(F.broadcast(nation), supplier["s_nationkey"] == nation["n_nationkey"])
        .join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("n_name").alias("nation"), F.col("p_type").alias("ptype"))
        .agg(F.sum(_vol()).alias("_rev"))
    )
    nat = cell.groupBy("nation").agg(
        F.sum("_rev").alias("_nat_rev"),
        F.count(F.lit(1)).alias("n_types"),
    )
    w = Window.partitionBy("nation").orderBy(F.desc("_rev"), "ptype")
    top = cell.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") == 1)
    return (
        top.join(F.broadcast(nat), "nation")
        .select(
            "nation",
            F.col("ptype").alias("top_type"),
            F.col("_rev").cast("double").alias("top_type_revenue"),
            F.round(
                F.col("_rev").cast("double") / F.col("_nat_rev").cast("double"), 9
            ).alias("share_of_nation"),
            "n_types",
        )
        .orderBy("nation")
    )


NATION_TYPE_SPECIALIZATION_ORACLE = f"""
WITH cell AS (
  SELECT n_name AS nation, p_type AS ptype, SUM({_VOL_SQL}) AS _rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
),
nat AS (
  SELECT nation, SUM(_rev) AS _nat_rev, COUNT(*) AS n_types
  FROM cell GROUP BY 1
),
top AS (
  SELECT nation, ptype, _rev,
         row_number() OVER (PARTITION BY nation
                            ORDER BY _rev DESC, ptype) AS _rk
  FROM cell
)
SELECT t.nation, t.ptype AS top_type,
       CAST(t._rev AS DOUBLE) AS top_type_revenue,
       round(CAST(t._rev AS DOUBLE) / CAST(n._nat_rev AS DOUBLE), 9)
         AS share_of_nation,
       CAST(n.n_types AS BIGINT) AS n_types
FROM top t JOIN nat n USING (nation)
WHERE t._rk = 1 ORDER BY t.nation
"""


def supplier_acctbal_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier account-balance health per nation: count, balance
    totals/extremes and the share of suppliers in the red — the
    supplier-risk screen next to ``q22_idle_balances``' customer
    version.

    Plan: one broadcast dim join + one partial-aggregatable groupBy
    to |nations| cells.  Balance sums are DECIMAL; the negative share
    is one double division of exact counts."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supplier.join(
            F.broadcast(nation), supplier["s_nationkey"] == nation["n_nationkey"]
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(_dec("s_acctbal")).alias("_bal"),
            F.min(_dec("s_acctbal")).alias("_min"),
            F.max(_dec("s_acctbal")).alias("_max"),
            F.sum((F.col("s_acctbal") < 0).cast("long")).alias("n_negative"),
        )
        .select(
            "nation",
            "n_suppliers",
            F.col("_bal").cast("double").alias("total_balance"),
            F.round(
                F.col("_bal").cast("double") / F.col("n_suppliers").cast("double"),
                9,
            ).alias("avg_balance"),
            F.col("_min").cast("double").alias("min_balance"),
            F.col("_max").cast("double").alias("max_balance"),
            (
                F.col("n_negative").cast("double")
                / F.col("n_suppliers").cast("double")
            ).alias("negative_share"),
        )
        .orderBy("nation")
    )


SUPPLIER_ACCTBAL_NATION_ORACLE = """
SELECT n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_balance,
       round(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 9) AS avg_balance,
       CAST(MIN(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS min_balance,
       CAST(MAX(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS max_balance,
       CAST(SUM(CASE WHEN s_acctbal < 0 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS negative_share
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1 ORDER BY 1
"""


def supply_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part↔supplier bipartite graph: how
    many distinct suppliers serve each part, how many distinct parts
    each supplier ships, histogrammed per side — the sourcing-
    redundancy profile (degree-1 parts are single-sourced risk).

    Plan: ONE distinct over (part, supplier) pairs feeds both sides'
    degree aggregates; histograms are degree-grain (tiny).  All
    counts exact."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    ph = (
        pairs.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_entities"))
        .select(F.lit("part").alias("side"), "degree", "n_entities")
    )
    sh = (
        pairs.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_entities"))
        .select(F.lit("supplier").alias("side"), "degree", "n_entities")
    )
    return ph.unionByName(sh).orderBy("side", "degree")


SUPPLY_DEGREE_ORACLE = """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
pdeg AS (SELECT l_partkey, COUNT(*) AS degree FROM pairs GROUP BY 1),
sdeg AS (SELECT l_suppkey, COUNT(*) AS degree FROM pairs GROUP BY 1)
SELECT 'part' AS side, degree, CAST(COUNT(*) AS BIGINT) AS n_entities
FROM pdeg GROUP BY 2
UNION ALL
SELECT 'supplier' AS side, degree, CAST(COUNT(*) AS BIGINT) AS n_entities
FROM sdeg GROUP BY 2
ORDER BY side, degree
"""


def order_value_boxplot_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order-value box plot: min / q1 / median / q3 / max of
    ``o_totalprice`` per order month — the distribution-shift monitor
    behind "did order sizes move this month?".  Quartiles are
    DISCRETE (the value at rank ⌈q·n⌉ — exact integer rank
    arithmetic on cent-quantized prices, never float interpolation,
    the ``value_p90_concentration_by_type`` contract).

    Plan: orders reduce to (month, cents) HISTOGRAM cells; ONE
    cumulative window over those distinct-value cells; all three
    quartile cutoffs come from one conditional-min aggregate of the
    same pass."""
    orders = load_table(spark, sf_dir, "orders")
    month = F.date_format(F.col("o_orderdate"), "yyyy-MM")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    hist = orders.groupBy(month.alias("month"), cents.alias("vc")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = hist.groupBy("month").agg(
        F.sum("cnt").alias("n_orders"),
        F.min("vc").alias("_min"),
        F.max("vc").alias("_max"),
    )
    wv = Window.partitionBy("month").orderBy("vc")
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    j = cum.join(F.broadcast(tot), "month")
    r25 = F.expr("CAST((n_orders + 3) DIV 4 AS BIGINT)")
    r50 = F.expr("CAST((n_orders + 1) DIV 2 AS BIGINT)")
    r75 = F.expr("CAST((3 * n_orders + 3) DIV 4 AS BIGINT)")
    q = j.groupBy("month", "n_orders", "_min", "_max").agg(
        F.min(F.when(F.col("cum") >= r25, F.col("vc"))).alias("_q1"),
        F.min(F.when(F.col("cum") >= r50, F.col("vc"))).alias("_q2"),
        F.min(F.when(F.col("cum") >= r75, F.col("vc"))).alias("_q3"),
    )
    return q.select(
        "month",
        "n_orders",
        (F.col("_min").cast("double") / 100).alias("min_value"),
        (F.col("_q1").cast("double") / 100).alias("q1_value"),
        (F.col("_q2").cast("double") / 100).alias("median_value"),
        (F.col("_q3").cast("double") / 100).alias("q3_value"),
        (F.col("_max").cast("double") / 100).alias("max_value"),
    ).orderBy("month")


ORDER_VALUE_BOXPLOT_ORACLE = """
WITH hist AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS vc,
         COUNT(*) AS cnt
  FROM orders GROUP BY 1, 2
),
tot AS (
  SELECT month, SUM(cnt) AS n_orders, MIN(vc) AS _min, MAX(vc) AS _max
  FROM hist GROUP BY 1
),
cum AS (
  SELECT month, vc,
         SUM(cnt) OVER (PARTITION BY month ORDER BY vc
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM hist
),
q AS (
  SELECT c.month, t.n_orders, t._min, t._max,
         MIN(CASE WHEN c.cum >= (t.n_orders + 3) // 4 THEN c.vc END) AS _q1,
         MIN(CASE WHEN c.cum >= (t.n_orders + 1) // 2 THEN c.vc END) AS _q2,
         MIN(CASE WHEN c.cum >= (3 * t.n_orders + 3) // 4 THEN c.vc END) AS _q3
  FROM cum c JOIN tot t USING (month)
  GROUP BY 1, 2, 3, 4
)
SELECT month, CAST(n_orders AS BIGINT) AS n_orders,
       CAST(_min AS DOUBLE) / 100 AS min_value,
       CAST(_q1 AS DOUBLE) / 100 AS q1_value,
       CAST(_q2 AS DOUBLE) / 100 AS median_value,
       CAST(_q3 AS DOUBLE) / 100 AS q3_value,
       CAST(_max AS DOUBLE) / 100 AS max_value
FROM q ORDER BY month
"""


def basket_size_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket composition per market segment: average line count and
    order value of each segment's orders — the "do BUILDING customers
    place bigger baskets?" merchandising cut.

    Plan: lineitem reduces to order-grain line counts FIRST (one
    partial-aggregatable groupBy), then joins orders + the customer
    dim and rolls up to |segments| cells.  Value sums DECIMAL; means
    are single double divisions."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    per_order = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_lines"))
    j = per_order.join(
        orders, per_order["l_orderkey"] == orders["o_orderkey"]
    ).join(customer, orders["o_custkey"] == customer["c_custkey"])
    return (
        j.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("n_lines").alias("_lines"),
            F.sum(_dec("o_totalprice")).alias("_val"),
        )
        .select(
            "segment",
            "n_orders",
            F.round(
                F.col("_lines").cast("double") / F.col("n_orders").cast("double"),
                9,
            ).alias("avg_lines_per_order"),
            F.round(
                F.col("_val").cast("double") / F.col("n_orders").cast("double"),
                9,
            ).alias("avg_order_value"),
        )
        .orderBy("segment")
    )


BASKET_SIZE_SEGMENT_ORACLE = """
WITH per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem GROUP BY 1
)
SELECT c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       round(CAST(SUM(n_lines) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
         AS avg_lines_per_order,
       round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 9) AS avg_order_value
FROM per_order
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY 1
"""


def customer_decile_share_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FORCED two-pass plan of
    :func:`customer_decile_revenue_share`, gated against the SAME
    oracle — a driver-verified proof that the rank-offset cut is
    bit-identical to ``ntile()`` (VERDICT r11 Next #5)."""
    return customer_decile_revenue_share(spark, sf_dir, two_pass=True)


def customer_onetime_vs_repeat_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Yearly revenue split between ONE-TIME customers (exactly one
    lifetime order) and REPEAT customers — the acquisition-quality
    trend every retention deck opens with (reference README.md:17's
    warehouse-SQL reporting surface).

    Plan: one customer-grain aggregate classifies customers (orders
    is touched once for the lifetime counts), then the order stream
    joins that enum-width label and reduces to (year, class) cells.
    Revenue through DECIMAL; shares are one double division of exact
    decimals."""
    orders = load_table(spark, sf_dir, "orders")
    life = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("_n_orders")
    )
    label = F.when(F.col("_n_orders") == 1, "one_time").otherwise("repeat")
    yr = F.year("o_orderdate")
    cell = (
        orders.join(life.select("o_custkey", label.alias("cust_class")), "o_custkey")
        .groupBy(yr.alias("order_year"), "cust_class")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).alias("_rev"),
        )
    )
    ytot = cell.groupBy("order_year").agg(F.sum("_rev").alias("_ytot"))
    return (
        cell.join(F.broadcast(ytot), "order_year")
        .select(
            "order_year",
            "cust_class",
            "n_customers",
            "n_orders",
            F.col("_rev").cast("double").alias("revenue"),
            F.round(
                F.col("_rev").cast("double") / F.col("_ytot").cast("double"), 9
            ).alias("share_of_year"),
        )
        .orderBy("order_year", "cust_class")
    )


ONETIME_REPEAT_ORACLE = """
WITH life AS (
  SELECT o_custkey, COUNT(*) AS _n FROM orders GROUP BY 1
),
cell AS (
  SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
         CASE WHEN l._n = 1 THEN 'one_time' ELSE 'repeat' END AS cust_class,
         COUNT(DISTINCT o.o_custkey) AS n_customers,
         COUNT(*) AS n_orders,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS _rev
  FROM orders o JOIN life l USING (o_custkey)
  GROUP BY 1, 2
),
ytot AS (SELECT order_year, SUM(_rev) AS _ytot FROM cell GROUP BY 1)
SELECT c.order_year, c.cust_class, CAST(c.n_customers AS BIGINT) AS n_customers,
       CAST(c.n_orders AS BIGINT) AS n_orders,
       CAST(c._rev AS DOUBLE) AS revenue,
       round(CAST(c._rev AS DOUBLE) / CAST(y._ytot AS DOUBLE), 9)
         AS share_of_year
FROM cell c JOIN ytot y USING (order_year)
ORDER BY c.order_year, c.cust_class
"""


def order_lines_value_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-size × order-value cross-tab: line-count bucket (capped
    at 7+) against 50k-wide total-price bands (capped at 300k+), with
    counts and average price per cell — the 2-D composition view
    behind ``order_size_histogram``'s 1-D margin.

    Plan: lineitem reduces to order grain FIRST (one exchange on the
    fact table), joins orders on the order key, and collapses to an
    enum-sized cell table.  Averages are exact-decimal sums over
    exact counts, divided once."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    j = orders.join(
        per_order, orders["o_orderkey"] == per_order["l_orderkey"]
    )
    line_bucket = F.least(F.col("n_lines"), F.lit(7))
    band = F.least(
        F.floor(F.col("o_totalprice") / 50000) * 50000, F.lit(300000)
    )
    cell = j.groupBy(
        line_bucket.cast("int").alias("line_bucket"),
        band.cast("int").alias("price_band"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).alias("_sum"),
    )
    return cell.select(
        "line_bucket",
        "price_band",
        "n_orders",
        F.round(
            F.col("_sum").cast("double") / F.col("n_orders").cast("double"), 6
        ).alias("avg_price"),
    ).orderBy("line_bucket", "price_band")


ORDER_LINES_VALUE_ORACLE = """
WITH per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem GROUP BY 1
),
cell AS (
  SELECT CAST(least(p.n_lines, 7) AS INT) AS line_bucket,
         CAST(least(floor(o.o_totalprice / 50000) * 50000, 300000) AS INT)
           AS price_band,
         COUNT(*) AS n_orders,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS _sum
  FROM orders o JOIN per_order p ON o.o_orderkey = p.l_orderkey
  GROUP BY 1, 2
)
SELECT line_bucket, price_band, CAST(n_orders AS BIGINT) AS n_orders,
       round(CAST(_sum AS DOUBLE) / CAST(n_orders AS DOUBLE), 6) AS avg_price
FROM cell ORDER BY line_bucket, price_band
"""


def nation_revenue_rank_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation revenue league table, first half vs second half of the
    corpus date range (fixed cutoff 1995-01-01): rank in each half
    and the rank shift — the market-movement report behind
    ``region_trade_matrix``'s flow view.

    Plan: customer→nation is an enum-width broadcast join; the fact
    table reduces to (nation, half) cells in one pass; ranks are
    windows over the 25-row nation table (the module's
    enum-partition window precedent).  Revenue exact DECIMAL; rank
    ties broken by nation name."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    half = F.when(
        F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp"), "h1"
    ).otherwise("h2")
    cell = (
        orders.join(
            customer.select("c_custkey", "c_nationkey"),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", half.alias("_half"))
        .agg(F.sum(_dec("o_totalprice")).alias("_rev"))
    )
    zero = F.lit(0).cast(DEC)
    pivoted = cell.groupBy("n_name").agg(
        F.coalesce(
            F.sum(F.when(F.col("_half") == "h1", F.col("_rev"))), zero
        ).alias("_r1"),
        F.coalesce(
            F.sum(F.when(F.col("_half") == "h2", F.col("_rev"))), zero
        ).alias("_r2"),
    )
    w1 = Window.orderBy(F.col("_r1").desc(), "n_name")
    w2 = Window.orderBy(F.col("_r2").desc(), "n_name")
    return (
        pivoted.select(
            "n_name",
            F.col("_r1").cast("double").alias("rev_h1"),
            F.col("_r2").cast("double").alias("rev_h2"),
            F.rank().over(w1).cast("long").alias("rank_h1"),
            F.rank().over(w2).cast("long").alias("rank_h2"),
        )
        .withColumn("rank_shift", F.col("rank_h1") - F.col("rank_h2"))
        .orderBy("n_name")
    )


NATION_RANK_SHIFT_ORACLE = """
WITH cell AS (
  SELECT n.n_name,
         CASE WHEN o.o_orderdate < TIMESTAMP '1995-01-01' THEN 'h1'
              ELSE 'h2' END AS _half,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS _rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
pivoted AS (
  SELECT n_name,
         COALESCE(SUM(CASE WHEN _half = 'h1' THEN _rev END),
                  CAST(0 AS DECIMAL(18,6))) AS _r1,
         COALESCE(SUM(CASE WHEN _half = 'h2' THEN _rev END),
                  CAST(0 AS DECIMAL(18,6))) AS _r2
  FROM cell GROUP BY 1
)
SELECT n_name,
       CAST(_r1 AS DOUBLE) AS rev_h1,
       CAST(_r2 AS DOUBLE) AS rev_h2,
       CAST(rank() OVER (ORDER BY _r1 DESC, n_name) AS BIGINT) AS rank_h1,
       CAST(rank() OVER (ORDER BY _r2 DESC, n_name) AS BIGINT) AS rank_h2,
       CAST(rank() OVER (ORDER BY _r1 DESC, n_name)
            - rank() OVER (ORDER BY _r2 DESC, n_name) AS BIGINT) AS rank_shift
FROM pivoted ORDER BY n_name
"""


def repeat_customer_value_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do repeat customers spend MORE over their lifetime?  Per
    market segment: mean relative uplift from a repeat customer's
    FIRST to LAST order value, and the share whose last order beats
    the first — the lifetime-value trajectory summary next to
    ``cohort_ltv``'s absolute curve.

    Plan: one customer-grain min/max-struct aggregate over orders
    (chronology via the unique (orderdate, orderkey) prefix — no
    window over fact rows), one broadcast join to the customer dim,
    and an enum-sized segment rollup.  Per-customer uplift is one
    double division rounded to 9 dp into DECIMAL and summed AS
    DECIMAL (the module's division contract)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min(
            F.struct("o_orderdate", "o_orderkey", "o_totalprice")
        ).alias("_f"),
        F.max(
            F.struct("o_orderdate", "o_orderkey", "o_totalprice")
        ).alias("_l"),
    )
    first_p = F.col("_f.o_totalprice")
    last_p = F.col("_l.o_totalprice")
    uplift = F.round((last_p - first_p) / first_p, 9).cast("decimal(18,9)")
    rep = (
        per_cust.where(F.col("n_orders") >= 2)
        .join(
            customer.select("c_custkey", "c_mktsegment"),
            per_cust["o_custkey"] == F.col("c_custkey"),
        )
        .select(
            "c_mktsegment",
            uplift.alias("u"),
            F.when(last_p > first_p, 1).otherwise(0).alias("gain"),
        )
    )
    cell = rep.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_repeat_customers"),
        F.sum("u").alias("_su"),
        F.sum("gain").alias("_g"),
    )
    return cell.select(
        "c_mktsegment",
        "n_repeat_customers",
        F.round(
            F.col("_su").cast("double") / F.col("n_repeat_customers").cast("double"),
            9,
        ).alias("mean_uplift"),
        F.round(
            F.col("_g").cast("double") / F.col("n_repeat_customers").cast("double"),
            9,
        ).alias("share_gainers"),
    ).orderBy("c_mktsegment")


REPEAT_UPLIFT_ORACLE = """
WITH ranked AS (
  SELECT o_custkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rf,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rl,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders
  FROM orders
),
per_cust AS (
  SELECT o_custkey, MAX(n_orders) AS n_orders,
         MAX(CASE WHEN rf = 1 THEN o_totalprice END) AS first_p,
         MAX(CASE WHEN rl = 1 THEN o_totalprice END) AS last_p
  FROM ranked GROUP BY 1
),
rep AS (
  SELECT c.c_mktsegment,
         CAST(round((p.last_p - p.first_p) / p.first_p, 9)
              AS DECIMAL(18,9)) AS u,
         CASE WHEN p.last_p > p.first_p THEN 1 ELSE 0 END AS gain
  FROM per_cust p JOIN customer c ON p.o_custkey = c.c_custkey
  WHERE p.n_orders >= 2
)
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_repeat_customers,
       round(CAST(SUM(u) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
         AS mean_uplift,
       round(CAST(SUM(gain) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
         AS share_gainers
FROM rep GROUP BY 1 ORDER BY 1
"""


def discount_tax_margin_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective-charge cross-tab: discount percent × tax percent,
    with line counts and the charged amount (extprice·(1−disc)·
    (1+tax)) per cell — the pricing-policy grid that shows which
    discount/tax combinations actually carry revenue
    (``discount_by_quantity_bucket``'s second axis).

    Plan: one fact-table pass collapsing to an ~11×9 enum grid; the
    charge follows the q1 decimal-chain idiom (each product cast
    back to DECIMAL(18,6)) so sums are exact."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_pct = F.round(F.col("l_discount") * 100, 0).cast("int")
    tax_pct = F.round(F.col("l_tax") * 100, 0).cast("int")
    charge = (
        (_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))).cast(DEC)
        * (F.lit(1).cast(DEC) + _dec("l_tax"))
    ).cast(DEC)
    cell = li.groupBy(
        disc_pct.alias("discount_pct"), tax_pct.alias("tax_pct")
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(charge).alias("_chg"),
    )
    tot = cell.agg(F.sum("_chg").alias("_tot"))
    return (
        cell.crossJoin(F.broadcast(tot))
        .select(
            "discount_pct",
            "tax_pct",
            "n_lines",
            F.col("_chg").cast("double").alias("charged_revenue"),
            F.round(
                F.col("_chg").cast("double") / F.col("_tot").cast("double"), 9
            ).alias("share_of_charge"),
        )
        .orderBy("discount_pct", "tax_pct")
    )


DISCOUNT_TAX_GRID_ORACLE = """
WITH cell AS (
  SELECT CAST(round(l_discount * 100, 0) AS INT) AS discount_pct,
         CAST(round(l_tax * 100, 0) AS INT) AS tax_pct,
         COUNT(*) AS n_lines,
         SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                       * (CAST(1 AS DECIMAL(18,6))
                          - CAST(l_discount AS DECIMAL(18,6)))
                       AS DECIMAL(18,6))
                  * (CAST(1 AS DECIMAL(18,6))
                     + CAST(l_tax AS DECIMAL(18,6))) AS DECIMAL(18,6)))
           AS _chg
  FROM lineitem GROUP BY 1, 2
),
tot AS (SELECT SUM(_chg) AS _tot FROM cell)
SELECT c.discount_pct, c.tax_pct, CAST(c.n_lines AS BIGINT) AS n_lines,
       CAST(c._chg AS DOUBLE) AS charged_revenue,
       round(CAST(c._chg AS DOUBLE) / CAST(t._tot AS DOUBLE), 9)
         AS share_of_charge
FROM cell c CROSS JOIN tot t
ORDER BY c.discount_pct, c.tax_pct
"""


def customer_balance_vs_spend_quadrant(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Account-balance quartile × lifetime-spend quartile cross-tab
    over customers — the credit-vs-revenue segmentation behind
    collection and upsell lists (are low-balance customers also the
    big spenders?).

    Plan: orders reduce to customer grain FIRST; quartile CUTOFFS
    come from one tiny percentile aggregation and bucket assignment
    is ROW-LOCAL comparison against the broadcast cutoffs — the
    ``rfm_quartiles`` pattern, deliberately NOT an ntile over a
    global window (which would funnel every customer through one
    partition).  Output is a 16-cell grid; money through DECIMAL;
    ``percentile`` ≡ DuckDB ``quantile_cont`` bit-for-bit."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice")).alias("_spd")
    )
    cust = customer.select("c_custkey", "c_acctbal").join(
        spend, customer["c_custkey"] == spend["o_custkey"], "left"
    ).select(
        "c_custkey",
        "c_acctbal",
        F.coalesce(F.col("_spd"), F.lit(0).cast(DEC)).alias("_sp"),
    )
    cuts = cust.agg(
        F.expr("percentile(c_acctbal, array(0.25, 0.5, 0.75))").alias("bc"),
        F.expr(
            "percentile(cast(_sp as double), array(0.25, 0.5, 0.75))"
        ).alias("sc"),
    )

    def _q(v, cut):
        return (
            F.lit(1)
            + (v > F.element_at(cut, 1)).cast("int")
            + (v > F.element_at(cut, 2)).cast("int")
            + (v > F.element_at(cut, 3)).cast("int")
        )

    q = cust.crossJoin(F.broadcast(cuts)).select(
        "c_custkey",
        "c_acctbal",
        "_sp",
        _q(F.col("c_acctbal").cast("double"), F.col("bc")).alias("bal_quartile"),
        _q(F.col("_sp").cast("double"), F.col("sc")).alias("spend_quartile"),
    )
    cell = q.groupBy("bal_quartile", "spend_quartile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(_dec("c_acctbal")).alias("_sb"),
        F.sum("_sp").alias("_ss"),
    )
    return cell.select(
        "bal_quartile",
        "spend_quartile",
        "n_customers",
        F.round(
            F.col("_sb").cast("double") / F.col("n_customers").cast("double"), 6
        ).alias("mean_acctbal"),
        F.round(
            F.col("_ss").cast("double") / F.col("n_customers").cast("double"), 6
        ).alias("mean_spend"),
    ).orderBy("bal_quartile", "spend_quartile")


BALANCE_SPEND_QUADRANT_ORACLE = """
WITH spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS _sp
  FROM orders GROUP BY 1
),
cust AS (
  SELECT c.c_custkey, c.c_acctbal,
         COALESCE(s._sp, CAST(0 AS DECIMAL(18,6))) AS _sp
  FROM customer c LEFT JOIN spend s ON c.c_custkey = s.o_custkey
),
cuts AS (
  SELECT quantile_cont(c_acctbal, [0.25, 0.5, 0.75]) AS bc,
         quantile_cont(CAST(_sp AS DOUBLE), [0.25, 0.5, 0.75]) AS sc
  FROM cust
),
q AS (
  SELECT c_custkey, c_acctbal, _sp,
         1 + CAST(CAST(c_acctbal AS DOUBLE) > bc[1] AS INT)
           + CAST(CAST(c_acctbal AS DOUBLE) > bc[2] AS INT)
           + CAST(CAST(c_acctbal AS DOUBLE) > bc[3] AS INT) AS bal_quartile,
         1 + CAST(CAST(_sp AS DOUBLE) > sc[1] AS INT)
           + CAST(CAST(_sp AS DOUBLE) > sc[2] AS INT)
           + CAST(CAST(_sp AS DOUBLE) > sc[3] AS INT) AS spend_quartile
  FROM cust CROSS JOIN cuts
),
cell AS (
  SELECT bal_quartile, spend_quartile, COUNT(*) AS n_customers,
         SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS _sb, SUM(_sp) AS _ss
  FROM q GROUP BY 1, 2
)
SELECT CAST(bal_quartile AS INT) AS bal_quartile,
       CAST(spend_quartile AS INT) AS spend_quartile,
       CAST(n_customers AS BIGINT) AS n_customers,
       round(CAST(_sb AS DOUBLE) / CAST(n_customers AS DOUBLE), 6)
         AS mean_acctbal,
       round(CAST(_ss AS DOUBLE) / CAST(n_customers AS DOUBLE), 6)
         AS mean_spend
FROM cell ORDER BY bal_quartile, spend_quartile
"""


def order_value_zscore_outliers(
    spark: SparkSession, sf_dir: str, k: int = 20
) -> DataFrame:
    """Top-k order-value anomalies: orders ranked by |z-score| within
    their ORDER MONTH — the point-anomaly report (fat-finger prices,
    bulk mistakes) that month-relative normalization surfaces where a
    global threshold would miss seasonal drift.

    Determinism: month moments from exact DECIMAL sums (Σx, Σx² via
    the exact-moment idiom); each order's z is a row-level double
    expression on those sums rounded to 6 dp; ranking ends in the
    unique order key.  Plan: one month-grain aggregate broadcast back
    over the fact scan — no window over order rows."""
    orders = load_table(spark, sf_dir, "orders")
    mon = F.date_trunc("month", F.col("o_orderdate")).cast("date")
    x = _dec("o_totalprice")
    moments = orders.groupBy(mon.alias("month")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(x).alias("_sx"),
        F.sum((x * x).cast("decimal(38,12)")).alias("_sxx"),
    )
    nd = F.col("n_orders").cast("double")
    sx = F.col("_sx").cast("double")
    sxx = F.col("_sxx").cast("double")
    mean = sx / nd
    var = (sxx - sx * sx / nd) / (nd - 1.0)
    stats = moments.where(F.col("n_orders") > 1).select(
        "month",
        mean.alias("_mean"),
        F.sqrt(var).alias("_std"),
    )
    z = F.round(
        (F.col("o_totalprice") - F.col("_mean")) / F.col("_std"), 6
    )
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice", mon.alias("month"))
        .join(F.broadcast(stats), "month")
        .select(
            "o_orderkey",
            "o_custkey",
            "month",
            "o_totalprice",
            z.alias("zscore"),
        )
        .orderBy(F.abs(F.col("zscore")).desc(), "o_orderkey")
        .limit(k)
    )


ORDER_ZSCORE_ORACLE = """
WITH moments AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         COUNT(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS _sx,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(28,6))
                  * CAST(o_totalprice AS DECIMAL(28,6))
                  AS DECIMAL(38,12))) AS _sxx
  FROM orders GROUP BY 1
),
stats AS (
  SELECT month,
         CAST(_sx AS DOUBLE) / CAST(n_orders AS DOUBLE) AS _mean,
         sqrt((CAST(_sxx AS DOUBLE)
               - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE)
                 / CAST(n_orders AS DOUBLE))
              / (CAST(n_orders AS DOUBLE) - 1.0)) AS _std
  FROM moments WHERE n_orders > 1
)
SELECT o.o_orderkey, o.o_custkey,
       CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
       o.o_totalprice,
       round((o.o_totalprice - s._mean) / s._std, 6) AS zscore
FROM orders o
JOIN stats s ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = s.month
ORDER BY abs(round((o.o_totalprice - s._mean) / s._std, 6)) DESC, o.o_orderkey
LIMIT 20
"""


def part_brand_price_dispersion(
    spark: SparkSession, sf_dir: str, k: int = 15
) -> DataFrame:
    """Retail-price dispersion per brand — coefficient of variation
    (std/mean) from exact decimal moments, top-k most dispersed —
    the assortment-consistency audit behind ``retail_markup_by_type``
    (a brand whose prices swing 50% is a mixed bag, not a brand).

    One enum-sized brand aggregate; all non-exact math is row-level
    doubles on exact sums; ranking ends in the unique brand key."""
    part = load_table(spark, sf_dir, "part")
    x = _dec("p_retailprice")
    cell = part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(x).alias("_sx"),
        F.sum((x * x).cast("decimal(38,12)")).alias("_sxx"),
    )
    nd = F.col("n_parts").cast("double")
    sx = F.col("_sx").cast("double")
    sxx = F.col("_sxx").cast("double")
    mean = sx / nd
    std = F.sqrt((sxx - sx * sx / nd) / (nd - 1.0))
    return (
        cell.where(F.col("n_parts") > 1)
        .select(
            "p_brand",
            "n_parts",
            F.round(mean, 6).alias("mean_price"),
            F.round(std, 6).alias("std_price"),
            F.round(std / mean, 9).alias("cv"),
        )
        .orderBy(F.col("cv").desc(), "p_brand")
        .limit(k)
    )


BRAND_PRICE_DISPERSION_ORACLE = """
WITH cell AS (
  SELECT p_brand, COUNT(*) AS n_parts,
         SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS _sx,
         SUM(CAST(CAST(p_retailprice AS DECIMAL(18,6))
                  * CAST(p_retailprice AS DECIMAL(18,6))
                  AS DECIMAL(38,12))) AS _sxx
  FROM part GROUP BY 1
)
SELECT p_brand, CAST(n_parts AS BIGINT) AS n_parts,
       round(CAST(_sx AS DOUBLE) / CAST(n_parts AS DOUBLE), 6) AS mean_price,
       round(sqrt((CAST(_sxx AS DOUBLE)
                   - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE)
                     / CAST(n_parts AS DOUBLE))
                  / (CAST(n_parts AS DOUBLE) - 1.0)), 6) AS std_price,
       round(sqrt((CAST(_sxx AS DOUBLE)
                   - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE)
                     / CAST(n_parts AS DOUBLE))
                  / (CAST(n_parts AS DOUBLE) - 1.0))
             / (CAST(_sx AS DOUBLE) / CAST(n_parts AS DOUBLE)), 9) AS cv
FROM cell WHERE n_parts > 1
ORDER BY cv DESC, p_brand
LIMIT 15
"""


def monthly_revenue_seasonality_strength(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Seasonality-strength decomposition of monthly revenue: the
    share of month-to-month revenue variance explained by the
    MONTH-OF-YEAR means (an STL-lite R² — ~1 means a strongly
    seasonal calendar, ~0 means noise/trend dominates) plus the
    peak/trough months.  The summary number behind
    ``orders_seasonality_index``'s per-month detail.

    Determinism: monthly revenue is exact DECIMAL; the grand/seasonal
    means and the two sums of squares go through the module's
    rounded-term contract (each squared deviation rounded to 6 dp
    into DECIMAL(38,6) and summed AS DECIMAL), so the R² is one
    double division of exact decimals.  Plan: month-grain aggregate →
    month-of-year aggregate → two tiny rollups; nothing fact-grain
    past the first groupBy."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(F.sum(_dec("o_totalprice")).alias("_rev"))
    moy = monthly.select(
        F.month("month").alias("moy"),
        F.col("_rev").alias("rev_dec"),
        F.col("_rev").cast("double").alias("rev"),
    )
    # means divide EXACT decimal sums once — never a raw double sum
    grand = moy.agg(
        F.count(F.lit(1)).alias("n_months"),
        (
            F.sum("rev_dec").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("_gm"),
    )
    seasonal = moy.groupBy("moy").agg(
        F.count(F.lit(1)).alias("n_years"),
        (
            F.sum("rev_dec").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("_sm"),
    )
    dev = (
        moy.join(F.broadcast(seasonal), "moy")
        .crossJoin(F.broadcast(grand))
        .select(
            "moy",
            "_sm",
            "_gm",
            F.round((F.col("rev") - F.col("_gm")) * (F.col("rev") - F.col("_gm")), 6)
            .cast("decimal(38,6)")
            .alias("_tot2"),
            F.round((F.col("rev") - F.col("_sm")) * (F.col("rev") - F.col("_sm")), 6)
            .cast("decimal(38,6)")
            .alias("_res2"),
        )
    )
    agg = dev.agg(
        F.count(F.lit(1)).alias("n_months"),
        F.sum("_tot2").alias("_sst"),
        F.sum("_res2").alias("_ssr"),
    )
    # deterministic argmax/argmin: tie-break to the SMALLEST month id
    # on both sides (negated month inside the max struct)
    peaks = seasonal.agg(
        F.max(
            F.struct(F.col("_sm").alias("v"), (-F.col("moy")).alias("nm"))
        ).alias("_pk"),
        F.min(
            F.struct(F.col("_sm").alias("v"), F.col("moy").alias("m"))
        ).alias("_tr"),
    )
    return agg.crossJoin(F.broadcast(peaks)).select(
        "n_months",
        F.round(
            (F.col("_sst").cast("double") - F.col("_ssr").cast("double"))
            / F.col("_sst").cast("double"),
            9,
        ).alias("seasonality_r2"),
        (-F.col("_pk.nm")).cast("int").alias("peak_month"),
        F.col("_tr.m").cast("int").alias("trough_month"),
    )


SEASONALITY_STRENGTH_ORACLE = """
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS _rev
  FROM orders GROUP BY 1
),
moy AS (
  SELECT CAST(month(month) AS INT) AS moy, _rev AS rev_dec,
         CAST(_rev AS DOUBLE) AS rev
  FROM monthly
),
grand AS (
  SELECT COUNT(*) AS n_months,
         CAST(SUM(rev_dec) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS _gm
  FROM moy
),
seasonal AS (
  SELECT moy, COUNT(*) AS n_years,
         CAST(SUM(rev_dec) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS _sm
  FROM moy GROUP BY 1
),
dev AS (
  SELECT m.moy,
         CAST(round((m.rev - g._gm) * (m.rev - g._gm), 6)
              AS DECIMAL(38,6)) AS _tot2,
         CAST(round((m.rev - s._sm) * (m.rev - s._sm), 6)
              AS DECIMAL(38,6)) AS _res2
  FROM moy m JOIN seasonal s USING (moy) CROSS JOIN grand g
),
agg AS (
  SELECT COUNT(*) AS n_months, SUM(_tot2) AS _sst, SUM(_res2) AS _ssr
  FROM dev
),
peaks AS (
  SELECT (SELECT moy FROM seasonal ORDER BY _sm DESC, moy ASC LIMIT 1)
           AS peak_month,
         (SELECT moy FROM seasonal ORDER BY _sm ASC, moy ASC LIMIT 1)
           AS trough_month
)
SELECT CAST(a.n_months AS BIGINT) AS n_months,
       round((CAST(a._sst AS DOUBLE) - CAST(a._ssr AS DOUBLE))
             / CAST(a._sst AS DOUBLE), 9) AS seasonality_r2,
       CAST(p.peak_month AS INT) AS peak_month,
       CAST(p.trough_month AS INT) AS trough_month
FROM agg a CROSS JOIN peaks p
"""


def quantity_uniformity_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square uniformity audit of the line-item quantity column
    over its 1..50 integer domain — the data-quality screen that
    catches a generator or ingest bug skewing a supposedly-uniform
    discrete field (the distributional sibling of
    ``benford_price_audit``).

    Exactness: with e = N/50, χ² = Σ(o−e)²/e = Σ(50·o − N)² /
    (50·N) — the numerator is an EXACT integer sum (DECIMAL), so the
    statistic is one double division.  Plan: one fact-grain groupBy
    to ≤50 cells, then a scalar rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.round(F.col("l_quantity"), 0).cast("long")
    cell = li.groupBy(q.alias("qty")).agg(F.count(F.lit(1)).alias("o"))
    tot = cell.agg(
        F.sum("o").alias("_n"), F.count(F.lit(1)).alias("n_levels")
    )
    term = (
        F.lit(50).cast("decimal(38,0)") * F.col("o").cast("decimal(38,0)")
        - F.col("_n").cast("decimal(38,0)")
    )
    agg = cell.crossJoin(F.broadcast(tot)).agg(
        F.max("_n").alias("n_lines"),
        F.max("n_levels").alias("n_levels"),
        F.sum((term * term).cast("decimal(38,0)")).alias("_num"),
    )
    return agg.select(
        "n_lines",
        F.col("n_levels").cast("long").alias("n_levels"),
        F.round(
            F.col("_num").cast("double")
            / (50.0 * F.col("n_lines").cast("double")),
            6,
        ).alias("chi2_vs_uniform"),
    )


QUANTITY_CHI2_ORACLE = """
WITH cell AS (
  SELECT CAST(round(l_quantity, 0) AS BIGINT) AS qty, COUNT(*) AS o
  FROM lineitem GROUP BY 1
),
tot AS (SELECT SUM(o) AS _n, COUNT(*) AS n_levels FROM cell),
agg AS (
  SELECT MAX(t._n) AS n_lines, MAX(t.n_levels) AS n_levels,
         SUM((CAST(50 AS HUGEINT) * c.o - t._n)
             * (CAST(50 AS HUGEINT) * c.o - t._n)) AS _num
  FROM cell c CROSS JOIN tot t
)
SELECT CAST(n_lines AS BIGINT) AS n_lines,
       CAST(n_levels AS BIGINT) AS n_levels,
       round(CAST(_num AS DOUBLE) / (50.0 * CAST(n_lines AS DOUBLE)), 6)
         AS chi2_vs_uniform
FROM agg
"""


def order_value_percentiles_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-value p10/p50/p90 per market segment — the spread table
    behind segment pricing reviews (medians resist the whale skew
    that means hide).  One segment-partitioned percentile AGGREGATE
    (the ``rfm_quartiles`` cutoff machinery — never a global window);
    revenue through DECIMAL; ``percentile`` ≡ DuckDB
    ``quantile_cont``."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = orders.join(
        customer.select("c_custkey", "c_mktsegment"),
        orders["o_custkey"] == F.col("c_custkey"),
    )
    cell = j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).alias("_rev"),
        F.expr("percentile(o_totalprice, array(0.1, 0.5, 0.9))").alias("_p"),
    )
    return cell.select(
        "c_mktsegment",
        "n_orders",
        F.col("_rev").cast("double").alias("revenue"),
        F.round(F.element_at("_p", 1), 6).alias("p10"),
        F.round(F.element_at("_p", 2), 6).alias("p50"),
        F.round(F.element_at("_p", 3), 6).alias("p90"),
    ).orderBy("c_mktsegment")


SEGMENT_VALUE_PERCENTILES_ORACLE = """
SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       round(quantile_cont(o.o_totalprice, 0.1), 6) AS p10,
       round(quantile_cont(o.o_totalprice, 0.5), 6) AS p50,
       round(quantile_cont(o.o_totalprice, 0.9), 6) AS p90
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1 ORDER BY 1
"""


def supplier_dependency_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-chain concentration screen: per part TYPE, the average
    share of a part's shipped quantity carried by its TOP supplier,
    and the fraction of parts where one supplier carries >50% — the
    single-source-risk table procurement reads before a
    diversification push.

    Plan: lineitem reduces to (part, supplier) grain FIRST, then to
    part grain (max share), then joins the part dim and rolls up to
    the type enum.  Per-part shares are one double division of exact
    decimals, rounded to 9 dp into DECIMAL and averaged AS DECIMAL
    (the module's division contract — never a raw double sum)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_quantity")).alias("_q")
    )
    per_part = ps.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.max("_q").alias("_top"),
        F.sum("_q").alias("_tot"),
    )
    share = F.round(
        F.col("_top").cast("double") / F.col("_tot").cast("double"), 9
    ).cast("decimal(18,9)")
    tagged = per_part.select(
        "l_partkey",
        "n_suppliers",
        share.alias("_sh"),
        (F.col("_top").cast("double") / F.col("_tot").cast("double") > 0.5)
        .cast("int")
        .alias("_risk"),
    ).join(
        part.select("p_partkey", "p_type"),
        per_part["l_partkey"] == F.col("p_partkey"),
    )
    cell = tagged.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(
            F.sum("_sh").cast("double") / F.count(F.lit(1)).cast("double"), 9
        ).alias("avg_top_supplier_share"),
        F.round(
            F.sum("_risk").cast("double") / F.count(F.lit(1)).cast("double"), 9
        ).alias("single_source_risk_rate"),
    )
    return cell.orderBy("p_type")


SUPPLIER_DEPENDENCY_ORACLE = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,6))) AS _q
  FROM lineitem GROUP BY 1, 2
),
per_part AS (
  SELECT l_partkey, COUNT(*) AS n_suppliers,
         MAX(_q) AS _top, SUM(_q) AS _tot
  FROM ps GROUP BY 1
),
tagged AS (
  SELECT p.p_type,
         CAST(round(CAST(pp._top AS DOUBLE) / CAST(pp._tot AS DOUBLE), 9)
              AS DECIMAL(18,9)) AS _sh,
         CASE WHEN CAST(pp._top AS DOUBLE) / CAST(pp._tot AS DOUBLE) > 0.5
              THEN 1 ELSE 0 END AS _risk
  FROM per_part pp JOIN part p ON pp.l_partkey = p.p_partkey
)
SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n_parts,
       round(CAST(SUM(_sh) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
         AS avg_top_supplier_share,
       round(CAST(SUM(_risk) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
         AS single_source_risk_rate
FROM tagged GROUP BY 1 ORDER BY 1
"""


def brand_cross_region_price_gap(
    spark: SparkSession, sf_dir: str, k: int = 15
) -> DataFrame:
    """Cross-region price dispersion per brand: revenue-weighted unit
    price (Σ extprice / Σ qty) of each brand in each supplier REGION,
    and the max−min gap across regions — the arbitrage/pricing-policy
    screen (a brand 20% pricier in one region is a policy or data
    problem).  Only brands shipped in ALL regions rank.

    Plan: the fact table reduces to (brand, region) cells through
    broadcast dim joins (supplier→nation→region are enum-width;
    part joins by key under AQE); the gap is a ≤5-row max−min per
    brand.  Unit prices are one double division of exact decimals,
    rounded identically before the gap subtraction."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dims = (
        supplier.select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "r_name")
    )
    cell = (
        li.join(dims, li["l_suppkey"] == F.col("s_suppkey"))
        .join(
            part.select("p_partkey", "p_brand"),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy("p_brand", "r_name")
        .agg(
            F.sum(_dec("l_extendedprice")).alias("_sp"),
            F.sum(_dec("l_quantity")).alias("_sq"),
        )
    )
    unit = F.round(
        F.col("_sp").cast("double") / F.col("_sq").cast("double"), 6
    )
    per_brand = cell.select("p_brand", "r_name", unit.alias("unit_price")).groupBy(
        "p_brand"
    ).agg(
        F.count(F.lit(1)).alias("n_regions"),
        F.max("unit_price").alias("max_unit_price"),
        F.min("unit_price").alias("min_unit_price"),
    )
    return (
        per_brand.where(F.col("n_regions") == 5)
        .select(
            "p_brand",
            "n_regions",
            "max_unit_price",
            "min_unit_price",
            F.round(
                F.col("max_unit_price") - F.col("min_unit_price"), 6
            ).alias("price_gap"),
        )
        .orderBy(F.col("price_gap").desc(), "p_brand")
        .limit(k)
    )


BRAND_REGION_PRICE_GAP_ORACLE = """
WITH cell AS (
  SELECT p.p_brand, r.r_name,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS _sp,
         SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS _sq
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
unitp AS (
  SELECT p_brand, r_name,
         round(CAST(_sp AS DOUBLE) / CAST(_sq AS DOUBLE), 6) AS unit_price
  FROM cell
),
per_brand AS (
  SELECT p_brand, COUNT(*) AS n_regions,
         MAX(unit_price) AS max_unit_price,
         MIN(unit_price) AS min_unit_price
  FROM unitp GROUP BY 1
)
SELECT p_brand, CAST(n_regions AS BIGINT) AS n_regions,
       max_unit_price, min_unit_price,
       round(max_unit_price - min_unit_price, 6) AS price_gap
FROM per_brand WHERE n_regions = 5
ORDER BY price_gap DESC, p_brand
LIMIT 15
"""


def price_trend_slope_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per part TYPE, the OLS slope of the quarterly revenue-weighted
    unit price over the quarter index — the one-number inflation
    trend behind ``part_price_index_quarterly``'s full curve (which
    types are getting dearer, and how fast per quarter).

    Determinism: quarterly unit prices are one double division of
    exact decimals rounded to 6 dp; the regression uses the integer-x
    identity slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) with Σxy and
    Σy accumulated as ROUNDED-TERM DECIMALS (the module contract —
    never a raw double sum) and Σx/Σx² exact integers.  Plan: fact →
    (type, quarter) cells via one part-key join, then a type-enum
    rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qidx = (
        (F.year("l_shipdate") - F.lit(1992)) * 4 + F.quarter("l_shipdate") - 1
    ).cast("long")
    cell = (
        li.join(
            part.select("p_partkey", "p_type"),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy("p_type", qidx.alias("x"))
        .agg(
            F.sum(_dec("l_extendedprice")).alias("_sp"),
            F.sum(_dec("l_quantity")).alias("_sq"),
        )
    )
    y = F.round(F.col("_sp").cast("double") / F.col("_sq").cast("double"), 6)
    xy = cell.select(
        "p_type",
        "x",
        y.alias("y"),
        F.round(F.col("x").cast("double") * y, 6)
        .cast("decimal(38,6)")
        .alias("_xy"),
        F.round(y, 6).cast("decimal(38,6)").alias("_y"),
    )
    agg = xy.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_quarters"),
        F.sum("x").alias("_sx"),
        F.sum(F.col("x") * F.col("x")).alias("_sxx"),
        F.sum("_xy").alias("_sxy"),
        F.sum("_y").alias("_sy"),
    )
    nd = F.col("n_quarters").cast("double")
    slope = (
        nd * F.col("_sxy").cast("double")
        - F.col("_sx").cast("double") * F.col("_sy").cast("double")
    ) / (
        nd * F.col("_sxx").cast("double")
        - F.col("_sx").cast("double") * F.col("_sx").cast("double")
    )
    return (
        agg.where(F.col("n_quarters") > 1)
        .select(
            "p_type",
            "n_quarters",
            F.round(
                F.col("_sy").cast("double") / nd, 6
            ).alias("mean_unit_price"),
            F.round(slope, 9).alias("price_slope_per_quarter"),
        )
        .orderBy("p_type")
    )


PRICE_TREND_SLOPE_ORACLE = """
WITH cell AS (
  SELECT p.p_type,
         CAST((year(l.l_shipdate) - 1992) * 4 + quarter(l.l_shipdate) - 1
              AS BIGINT) AS x,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS _sp,
         SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS _sq
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
xy AS (
  SELECT p_type, x,
         CAST(round(CAST(x AS DOUBLE)
                    * round(CAST(_sp AS DOUBLE) / CAST(_sq AS DOUBLE), 6), 6)
              AS DECIMAL(38,6)) AS _xy,
         CAST(round(round(CAST(_sp AS DOUBLE) / CAST(_sq AS DOUBLE), 6), 6)
              AS DECIMAL(38,6)) AS _y
  FROM cell
),
agg AS (
  SELECT p_type, COUNT(*) AS n_quarters, SUM(x) AS _sx, SUM(x * x) AS _sxx,
         SUM(_xy) AS _sxy, SUM(_y) AS _sy
  FROM xy GROUP BY 1
)
SELECT p_type, CAST(n_quarters AS BIGINT) AS n_quarters,
       round(CAST(_sy AS DOUBLE) / CAST(n_quarters AS DOUBLE), 6)
         AS mean_unit_price,
       round((CAST(n_quarters AS DOUBLE) * CAST(_sxy AS DOUBLE)
              - CAST(_sx AS DOUBLE) * CAST(_sy AS DOUBLE))
             / (CAST(n_quarters AS DOUBLE) * CAST(_sxx AS DOUBLE)
                - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE)), 9)
         AS price_slope_per_quarter
FROM agg WHERE n_quarters > 1
ORDER BY p_type
"""


QUERIES = {
    "lineitem_field_correlations": lineitem_field_correlations,
    "order_size_histogram": order_size_histogram,
    "order_weekday_priority_mix": order_weekday_priority_mix,
    "customer_interpurchase_gaps": customer_interpurchase_gaps,
    "acctbal_decile_profile": acctbal_decile_profile,
    "brand_return_rate_quarterly": brand_return_rate_quarterly,
    "retail_markup_by_type": retail_markup_by_type,
    "customer_decile_revenue_share": customer_decile_revenue_share,
    "customer_decile_share_twopass": customer_decile_share_twopass,
    "region_trade_matrix": region_trade_matrix,
    "part_size_value_bands": part_size_value_bands,
    "nation_type_specialization": nation_type_specialization,
    "supplier_acctbal_by_nation": supplier_acctbal_by_nation,
    "supply_degree_histogram": supply_degree_histogram,
    "order_value_boxplot_monthly": order_value_boxplot_monthly,
    "basket_size_by_segment": basket_size_by_segment,
    "customer_onetime_vs_repeat_revenue": customer_onetime_vs_repeat_revenue,
    "order_lines_value_matrix": order_lines_value_matrix,
    "nation_revenue_rank_shift": nation_revenue_rank_shift,
    "repeat_customer_value_uplift": repeat_customer_value_uplift,
    "discount_tax_margin_grid": discount_tax_margin_grid,
    "customer_balance_vs_spend_quadrant": customer_balance_vs_spend_quadrant,
    "order_value_zscore_outliers": order_value_zscore_outliers,
    "part_brand_price_dispersion": part_brand_price_dispersion,
    "monthly_revenue_seasonality_strength": monthly_revenue_seasonality_strength,
    "quantity_uniformity_chi2": quantity_uniformity_chi2,
    "order_value_percentiles_by_segment": order_value_percentiles_by_segment,
    "supplier_dependency_risk": supplier_dependency_risk,
    "brand_cross_region_price_gap": brand_cross_region_price_gap,
    "price_trend_slope_by_type": price_trend_slope_by_type,
}

ORACLES = {
    "price_trend_slope_by_type": PRICE_TREND_SLOPE_ORACLE,
    "order_value_percentiles_by_segment": SEGMENT_VALUE_PERCENTILES_ORACLE,
    "supplier_dependency_risk": SUPPLIER_DEPENDENCY_ORACLE,
    "brand_cross_region_price_gap": BRAND_REGION_PRICE_GAP_ORACLE,
    "monthly_revenue_seasonality_strength": SEASONALITY_STRENGTH_ORACLE,
    "quantity_uniformity_chi2": QUANTITY_CHI2_ORACLE,
    "customer_balance_vs_spend_quadrant": BALANCE_SPEND_QUADRANT_ORACLE,
    "order_value_zscore_outliers": ORDER_ZSCORE_ORACLE,
    "part_brand_price_dispersion": BRAND_PRICE_DISPERSION_ORACLE,
    "repeat_customer_value_uplift": REPEAT_UPLIFT_ORACLE,
    "discount_tax_margin_grid": DISCOUNT_TAX_GRID_ORACLE,
    "customer_onetime_vs_repeat_revenue": ONETIME_REPEAT_ORACLE,
    "order_lines_value_matrix": ORDER_LINES_VALUE_ORACLE,
    "nation_revenue_rank_shift": NATION_RANK_SHIFT_ORACLE,
    "customer_decile_share_twopass": CUSTOMER_DECILE_SHARE_ORACLE,
    "part_size_value_bands": PART_SIZE_BANDS_ORACLE,
    "nation_type_specialization": NATION_TYPE_SPECIALIZATION_ORACLE,
    "supplier_acctbal_by_nation": SUPPLIER_ACCTBAL_NATION_ORACLE,
    "supply_degree_histogram": SUPPLY_DEGREE_ORACLE,
    "order_value_boxplot_monthly": ORDER_VALUE_BOXPLOT_ORACLE,
    "basket_size_by_segment": BASKET_SIZE_SEGMENT_ORACLE,
    "lineitem_field_correlations": LINEITEM_CORR_ORACLE,
    "order_size_histogram": ORDER_SIZE_HIST_ORACLE,
    "order_weekday_priority_mix": ORDER_WEEKDAY_MIX_ORACLE,
    "customer_interpurchase_gaps": INTERPURCHASE_GAPS_ORACLE,
    "acctbal_decile_profile": ACCTBAL_DECILE_ORACLE,
    "brand_return_rate_quarterly": BRAND_RETURN_RATE_ORACLE,
    "retail_markup_by_type": RETAIL_MARKUP_ORACLE,
    "customer_decile_revenue_share": CUSTOMER_DECILE_SHARE_ORACLE,
    "region_trade_matrix": REGION_TRADE_ORACLE,
}
