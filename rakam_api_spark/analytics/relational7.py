"""Round-15 relational additions: returned-revenue impact by nation,
order-size value curve, year-over-year customer retention, median/
mean value gaps, settlement-mix lift, brand price-size regression,
supplier balance-vs-lateness, unit-price consistency, and high-value
repeat concentration — warehouse-SQL report shapes the reference
serves through its ad-hoc query service (reference
README.md:17,27-31; SURVEY.md §2.7), expressed as declarative
DataFrame plans.

Determinism conventions match relational.py: money through
DECIMAL(18,6); single ratios are one double division rounded to 9dp;
sqrt/regression chains round to 6dp; per-row doubles that must be
SUMMED across rows are cast to DECIMAL first (decimal addition is
exact and order-free, double addition is not); exact percentiles via
Spark ``percentile`` ≡ DuckDB ``quantile_cont`` (bit-identical
interpolation); every ordering ends in a unique key.

Scale notes (the relational6 convention): dimension joins carry NO
forced broadcast hint — part/supplier/customer grow with SF, so the
build side is left to AQE's runtime size check; nation (25 rows) and
single-row scalar frames keep explicit broadcasts.  Every query
reduces the fact tables with ONE aggregate (or one customer-keyed
window) before any small-grain arithmetic; nothing windows over
unbounded input without a partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .relational import DEC, _dec
from .relational2 import _VOL_SQL, _vol


def returns_impact_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-revenue exposure per customer nation: total line
    revenue, revenue on RETURNED lines (``l_returnflag = 'R'``), and
    the return share — the country-level materialization of TPC-H
    Q10's question (Q10 ranks customers; this sizes the problem per
    market).

    Plan (r16 join reorder, same values): customer⋈nation and
    orders⋈customer attach the dims to ORDERS first (custkey-grain
    shuffle of the order header, or an AQE broadcast where customer
    fits), so the one fact-fact shuffle (orderkey) carries lineitem
    against orders+n_name and the 600k-row joined fact is never
    re-shuffled by custkey — inner joins commute, the old plan
    shuffled the post-join fact a second time (guide §2.3/§3.3);
    ONE (nation) aggregate with a conditional DECIMAL sum — 25
    output rows."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    vol = _vol()
    returned = F.when(F.col("l_returnflag") == "R", vol).otherwise(
        F.lit(0).cast(DEC)
    )
    orders_n = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("o_orderkey", "n_name")
    )
    return (
        li.join(orders_n, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(vol).cast("double").alias("revenue"),
            F.sum(returned).cast("double").alias("returned_revenue"),
            F.round(
                F.sum(returned).cast("double") / F.sum(vol).cast("double"), 9
            ).alias("return_share"),
        )
        .orderBy("nation")
    )


RETURNS_IMPACT_ORACLE = f"""
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM({_VOL_SQL}) AS DOUBLE) AS revenue,
       CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN {_VOL_SQL}
                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
         AS returned_revenue,
       round(CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN {_VOL_SQL}
                           ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM({_VOL_SQL}) AS DOUBLE), 9) AS return_share
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY nation
"""


def order_line_count_value_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order size → value curve: orders bucketed by their LINE COUNT
    (1..7 in this schema), with order count, average header value,
    and total line revenue per bucket — "are bigger baskets worth
    proportionally more?", the order-composition sibling of
    ``basket_size_by_segment``.

    Plan: one orderkey aggregate of lineitem (count + DECIMAL revenue
    per order — map-side partial), joined to orders on the SAME
    orderkey (no extra shuffle grain), then ONE enum-sized aggregate
    over ≤ max-lines buckets."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(_vol()).alias("_rev"),
    )
    return (
        orders.join(per_order, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("n_lines")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # raw double division of an exact DECIMAL sum over an exact
            # count: bit-identical on both engines with NO rounding —
            # round(x, 9) at 1e5 magnitude is ULP-fragile cross-engine
            (
                F.sum(_dec("o_totalprice")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_order_value"),
            F.sum("_rev").cast("double").alias("line_revenue"),
        )
        .orderBy("n_lines")
    )


LINE_COUNT_CURVE_ORACLE = f"""
WITH per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_lines, SUM({_VOL_SQL}) AS _rev
  FROM lineitem GROUP BY 1
)
SELECT p.n_lines,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_order_value,
       CAST(SUM(p._rev) AS DOUBLE) AS line_revenue
FROM orders o JOIN per_order p ON o.o_orderkey = p.l_orderkey
GROUP BY p.n_lines
ORDER BY p.n_lines
"""


def customer_yoy_retention_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Year-over-year customer retention per market segment: of the
    customers who ordered in year Y, the share that ordered again in
    Y+1 — the relational analog of the events-side cohort retention
    (``retention_cohorts``), at the grain a subscription-style
    business reviews annually.

    Plan: orders reduce to DISTINCT (custkey, year) — custkey-keyed
    exchange; the Y→Y+1 self-join is equi on (custkey, year+1), so it
    reuses the same hash partitioning; customer⋈segment is un-hinted;
    final aggregate is (segment × years) enum-sized."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cy = orders.select(
        "o_custkey",
        F.year(F.col("o_orderdate").cast("date")).alias("yr"),
    ).distinct()
    nxt = cy.select(
        F.col("o_custkey").alias("_ck"), (F.col("yr") - 1).alias("_prev")
    )
    flagged = cy.join(
        nxt,
        (F.col("o_custkey") == F.col("_ck")) & (F.col("yr") == F.col("_prev")),
        "left",
    ).select(
        "o_custkey", "yr", F.col("_ck").isNotNull().alias("_retained")
    )
    return (
        flagged.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"), "yr")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(F.col("_retained").cast("long")).alias("n_retained"),
            F.round(
                F.sum(F.col("_retained").cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("retention"),
        )
        .orderBy("segment", "yr")
    )


YOY_RETENTION_ORACLE = """
WITH cy AS (
  SELECT DISTINCT o_custkey, year(CAST(o_orderdate AS DATE)) AS yr
  FROM orders
),
flagged AS (
  SELECT a.o_custkey, a.yr, (b.o_custkey IS NOT NULL) AS _retained
  FROM cy a LEFT JOIN cy b
    ON a.o_custkey = b.o_custkey AND b.yr = a.yr + 1
)
SELECT c.c_mktsegment AS segment, f.yr,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN f._retained THEN 1 ELSE 0 END) AS BIGINT)
         AS n_retained,
       round(CAST(SUM(CASE WHEN f._retained THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 9) AS retention
FROM flagged f JOIN customer c ON f.o_custkey = c.c_custkey
GROUP BY 1, 2
ORDER BY segment, yr
"""


def nation_order_value_median_gap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mean-vs-median order value per customer nation: the skew
    telltale (mean ≫ median ⇒ a whale-heavy market) behind
    market-level pricing reviews.

    Plan: orders⋈customer shuffles on custkey, customer⋈nation
    un-hinted; ONE 25-group aggregate where ``percentile`` is the
    exact sort-based form (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont`` bit-for-bit); at 100 TB swap in
    ``approx_percentile`` — same call shape.  Mean is an exact
    DECIMAL sum over count."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # raw double division (exact DECIMAL sum / exact count):
            # bit-identical cross-engine; round(x, 9) at 1e5 magnitude
            # is ULP-fragile
            (
                F.sum(_dec("o_totalprice")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_value"),
            F.expr("percentile(o_totalprice, 0.5)").alias("median_value"),
            F.round(
                F.sum(_dec("o_totalprice")).cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.expr("percentile(o_totalprice, 0.5)"),
                9,
            ).alias("mean_over_median"),
        )
        .orderBy("nation")
    )


MEDIAN_GAP_ORACLE = """
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS mean_value,
       quantile_cont(o.o_totalprice, 0.5) AS median_value,
       round(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE)
             / quantile_cont(o.o_totalprice, 0.5), 9) AS mean_over_median
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY nation
"""


def priority_settlement_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Settlement mix by order priority: for every (priority,
    linestatus) cell, the line count and its LIFT over independence
    (``P(pri,ls)·N / (P(pri)·P(ls))``) — "do urgent orders settle
    differently?", the χ²-style screen at the cell grain.

    Plan: lineitem⋈orders on orderkey (the one fact shuffle), ONE
    aggregate to ≤ 5·|statuses| cells, marginals aggregated FROM the
    cells (never a second fact scan) and joined back broadcast-sized;
    lift is one double division of exact long products."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cell = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("l_linestatus").alias("linestatus"),
        )
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    pm = cell.groupBy("priority").agg(F.sum("n_lines").alias("_np"))
    sm = cell.groupBy("linestatus").agg(F.sum("n_lines").alias("_ns"))
    tot = cell.agg(F.sum("n_lines").alias("_n"))
    return (
        cell.join(F.broadcast(pm), "priority")
        .join(F.broadcast(sm), "linestatus")
        .crossJoin(F.broadcast(tot))
        .select(
            "priority",
            "linestatus",
            "n_lines",
            F.round(
                (F.col("n_lines") * F.col("_n")).cast("double")
                / (F.col("_np") * F.col("_ns")).cast("double"),
                9,
            ).alias("lift"),
        )
        .orderBy("priority", "linestatus")
    )


SETTLEMENT_LIFT_ORACLE = """
WITH cell AS (
  SELECT o.o_orderpriority AS priority, l.l_linestatus AS linestatus,
         COUNT(*) AS n_lines
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
pm AS (SELECT priority, SUM(n_lines) AS _np FROM cell GROUP BY 1),
sm AS (SELECT linestatus, SUM(n_lines) AS _ns FROM cell GROUP BY 1),
tot AS (SELECT SUM(n_lines) AS _n FROM cell)
SELECT c.priority, c.linestatus, CAST(c.n_lines AS BIGINT) AS n_lines,
       round(CAST(c.n_lines * tot._n AS DOUBLE)
             / CAST(pm._np * sm._ns AS DOUBLE), 9) AS lift
FROM cell c
JOIN pm ON c.priority = pm.priority
JOIN sm ON c.linestatus = sm.linestatus
CROSS JOIN tot
ORDER BY c.priority, c.linestatus
"""


def brand_size_price_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS regression of retail price on part size — "does
    this brand charge for size?", the catalog-pricing-structure
    report (closed-form slope/intercept from exact sufficient
    statistics, the ``retention_powerlaw_fit`` convention).

    Plan: part-only — ONE |brands|-sized aggregate of exact sums
    (sizes are integers, price moments go through DECIMAL so the
    sums are order-free), then row-local closed-form OLS; no joins,
    no windows."""
    part = load_table(spark, sf_dir, "part")
    x = F.col("p_size").cast("long")
    y = _dec("p_retailprice")
    agg = part.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(x).alias("_sx"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y).alias("_sy"),
        F.sum((x.cast(DEC) * y).cast(DEC)).alias("_sxy"),
    )
    n = F.col("n_parts").cast("double")
    sx = F.col("_sx").cast("double")
    sxx = F.col("_sxx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return agg.select(
        "brand",
        "n_parts",
        F.round(slope, 6).alias("price_per_size"),
        F.round((sy - slope * sx) / n, 6).alias("base_price"),
    ).orderBy("brand")


BRAND_SLOPE_ORACLE = """
WITH agg AS (
  SELECT p_brand AS brand, COUNT(*) AS n_parts,
         SUM(CAST(p_size AS BIGINT)) AS _sx,
         SUM(CAST(p_size AS BIGINT) * CAST(p_size AS BIGINT)) AS _sxx,
         SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS _sy,
         SUM(CAST(CAST(p_size AS DECIMAL(18,6))
                  * CAST(p_retailprice AS DECIMAL(18,6))
                  AS DECIMAL(18,6))) AS _sxy
  FROM part GROUP BY 1
)
SELECT brand, CAST(n_parts AS BIGINT) AS n_parts,
       round((CAST(n_parts AS DOUBLE) * CAST(_sxy AS DOUBLE)
              - CAST(_sx AS DOUBLE) * CAST(_sy AS DOUBLE))
             / (CAST(n_parts AS DOUBLE) * CAST(_sxx AS DOUBLE)
                - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE)), 6)
         AS price_per_size,
       round((CAST(_sy AS DOUBLE)
              - (CAST(n_parts AS DOUBLE) * CAST(_sxy AS DOUBLE)
                 - CAST(_sx AS DOUBLE) * CAST(_sy AS DOUBLE))
                / (CAST(n_parts AS DOUBLE) * CAST(_sxx AS DOUBLE)
                   - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE))
                * CAST(_sx AS DOUBLE))
             / CAST(n_parts AS DOUBLE), 6) AS base_price
FROM agg
ORDER BY brand
"""


def supplier_balance_late_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier financial health vs delivery performance: suppliers
    banded by account balance (fixed cut points, row-local — never an
    NTILE over the supplier dim), each band's supplier count and late
    -line share (late = shipped ≥ 90 days after the order date, the
    q12/q21 convention) — the "are struggling suppliers the late
    ones?" procurement screen.

    Plan: lineitem⋈orders on orderkey, then ONE suppkey aggregate
    (late + total per supplier, map-side partial); supplier dim joins
    that supplier-grain aggregate un-hinted; final aggregate is
    enum-banded."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    late = (
        F.col("l_shipdate").cast("date")
        >= F.date_add(F.col("o_orderdate").cast("date"), 90)
    ).cast("long")
    per_supp = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(late).alias("_late"),
        )
    )
    band = (
        F.when(F.col("s_acctbal") < 0, "0_negative")
        .when(F.col("s_acctbal") < 2500, "1_low")
        .when(F.col("s_acctbal") < 5000, "2_mid")
        .when(F.col("s_acctbal") < 7500, "3_high")
        .otherwise("4_top")
    )
    return (
        supp.join(per_supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(band.alias("balance_band"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum("_n").alias("n_lines"),
            F.round(
                F.sum("_late").cast("double") / F.sum("_n").cast("double"), 9
            ).alias("late_share"),
        )
        .orderBy("balance_band")
    )


BALANCE_LATE_ORACLE = """
WITH per_supp AS (
  SELECT l.l_suppkey, COUNT(*) AS _n,
         SUM(CASE WHEN CAST(l.l_shipdate AS DATE)
                       >= CAST(o.o_orderdate AS DATE) + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END) AS _late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1
)
SELECT CASE WHEN s.s_acctbal < 0 THEN '0_negative'
            WHEN s.s_acctbal < 2500 THEN '1_low'
            WHEN s.s_acctbal < 5000 THEN '2_mid'
            WHEN s.s_acctbal < 7500 THEN '3_high'
            ELSE '4_top' END AS balance_band,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(p._n) AS BIGINT) AS n_lines,
       round(CAST(SUM(p._late) AS DOUBLE) / CAST(SUM(p._n) AS DOUBLE), 9)
         AS late_share
FROM supplier s JOIN per_supp p ON s.s_suppkey = p.l_suppkey
GROUP BY 1
ORDER BY balance_band
"""


def unit_price_consistency_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Unit-price discipline per part type: each part's RELATIVE
    SPREAD of realized unit price (extendedprice / quantity) across
    its lineitems — (max − min) / mean — averaged per p_type; high
    spread types price erratically (negotiated/spot), low spread
    types are list-priced.

    Plan: ONE partkey aggregate of exact DECIMAL statistics (unit
    price is one double division per row, then DECIMAL-cast so
    min/max/sum are exact and order-free — squared-moment CV would
    need cross-engine-fragile wide-decimal products), a row-local
    spread, then the per-type average ALSO goes through a DECIMAL
    cast (an avg of per-part doubles would be order-dependent); part
    dim joins the part-grain aggregate un-hinted.  Parts with one
    line are excluded row-locally (spread degenerate)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    u = (F.col("l_extendedprice") / F.col("l_quantity")).cast(DEC)
    per_part = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(u).alias("_su"),
        F.min(u).alias("_mn"),
        F.max(u).alias("_mx"),
    )
    spread = F.round(
        (F.col("_mx") - F.col("_mn")).cast("double")
        / (F.col("_su").cast("double") / F.col("_n").cast("double")),
        6,
    ).cast(DEC)
    return (
        per_part.where(F.col("_n") >= 2)
        .select("l_partkey", spread.alias("_spread"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_type").alias("part_type"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(
                F.sum("_spread").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("avg_price_spread"),
        )
        .orderBy("part_type")
    )


UNIT_PRICE_CV_ORACLE = """
WITH per_part AS (
  SELECT l_partkey, COUNT(*) AS _n,
         SUM(CAST(l_extendedprice / l_quantity AS DECIMAL(18,6))) AS _su,
         MIN(CAST(l_extendedprice / l_quantity AS DECIMAL(18,6))) AS _mn,
         MAX(CAST(l_extendedprice / l_quantity AS DECIMAL(18,6))) AS _mx
  FROM lineitem GROUP BY 1
),
spread AS (
  SELECT l_partkey,
         CAST(round(CAST(_mx - _mn AS DOUBLE)
                    / (CAST(_su AS DOUBLE) / CAST(_n AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS _spread
  FROM per_part WHERE _n >= 2
)
SELECT p.p_type AS part_type,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       round(CAST(SUM(s._spread) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS avg_price_spread
FROM spread s JOIN part p ON s.l_partkey = p.p_partkey
GROUP BY 1
ORDER BY part_type
"""


def high_value_repeat_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Whale stickiness per market segment: orders above the GLOBAL
    p90 of order value are "high-value"; per segment, how many such
    orders, how many distinct customers placed one, and the share of
    those customers who placed TWO OR MORE — whether big-ticket
    buying is episodic or a customer trait.

    Plan: the p90 threshold is one exact-percentile scalar aggregate
    broadcast back (at 100 TB: ``approx_percentile``, same shape);
    filtered orders aggregate per (custkey, segment) after an
    un-hinted customer join; the final aggregate is segment-sized."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    p90 = orders.agg(
        F.expr("percentile(o_totalprice, 0.9)").alias("_p90")
    )
    per_cust = (
        orders.crossJoin(F.broadcast(p90))
        .where(F.col("o_totalprice") > F.col("_p90"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(F.count(F.lit(1)).alias("_k"))
    )
    return (
        per_cust.groupBy("segment")
        .agg(
            F.sum("_k").alias("n_hv_orders"),
            F.count(F.lit(1)).alias("n_hv_customers"),
            F.round(
                F.sum((F.col("_k") >= 2).cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("repeat_share"),
        )
        .orderBy("segment")
    )


HIGH_VALUE_REPEAT_ORACLE = """
WITH p90 AS (SELECT quantile_cont(o_totalprice, 0.9) AS _p90 FROM orders),
per_cust AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey, COUNT(*) AS _k
  FROM orders o
  CROSS JOIN p90
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_totalprice > p90._p90
  GROUP BY 1, 2
)
SELECT segment,
       CAST(SUM(_k) AS BIGINT) AS n_hv_orders,
       CAST(COUNT(*) AS BIGINT) AS n_hv_customers,
       round(CAST(SUM(CASE WHEN _k >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 9) AS repeat_share
FROM per_cust
GROUP BY segment
ORDER BY segment
"""


def order_value_band_status_mix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-status composition across value quartiles: do high-value
    orders settle (F), stay open (O), or sit partially filled (P) at
    different rates than small ones — the credit-exposure contingency
    table behind ``priority_settlement_lift`` (which slices by
    priority; this slices by order size).

    Plan: the two-pass cutoff idiom (``customer_decile_share_twopass``)
    — ONE global percentile aggregate (single row, broadcast
    crossJoin), one (band, status) aggregate (≤ 4·|status| cells),
    band totals re-aggregated from the cells; shares are one 9dp
    double division; ``percentile`` ≡ ``quantile_cont``."""
    orders = load_table(spark, sf_dir, "orders")
    cuts = orders.agg(
        F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))").alias("_c")
    )
    banded = orders.crossJoin(F.broadcast(cuts)).withColumn(
        "value_band",
        F.when(F.col("o_totalprice") <= F.element_at("_c", 1), "Q1")
        .when(F.col("o_totalprice") <= F.element_at("_c", 2), "Q2")
        .when(F.col("o_totalprice") <= F.element_at("_c", 3), "Q3")
        .otherwise("Q4"),
    )
    cell = banded.groupBy("value_band", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).alias("_rev"),
    )
    btot = cell.groupBy("value_band").agg(F.sum("n_orders").alias("_bt"))
    return (
        cell.join(F.broadcast(btot), "value_band")
        .select(
            "value_band",
            "o_orderstatus",
            "n_orders",
            F.col("_rev").cast("double").alias("revenue"),
            F.round(
                F.col("n_orders").cast("double") / F.col("_bt").cast("double"),
                9,
            ).alias("band_share"),
        )
        .orderBy("value_band", "o_orderstatus")
    )


BAND_STATUS_MIX_ORACLE = """
WITH cuts AS (
  SELECT quantile_cont(o_totalprice, 0.25) AS c1,
         quantile_cont(o_totalprice, 0.5)  AS c2,
         quantile_cont(o_totalprice, 0.75) AS c3
  FROM orders
),
banded AS (
  SELECT CASE WHEN o_totalprice <= c1 THEN 'Q1'
              WHEN o_totalprice <= c2 THEN 'Q2'
              WHEN o_totalprice <= c3 THEN 'Q3'
              ELSE 'Q4' END AS value_band,
         o_orderstatus, o_totalprice
  FROM orders, cuts
),
cell AS (
  SELECT value_band, o_orderstatus, COUNT(*) AS n,
         SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
  FROM banded GROUP BY 1, 2
),
bt AS (SELECT value_band, SUM(n) AS _bt FROM cell GROUP BY 1)
SELECT c.value_band, c.o_orderstatus,
       CAST(c.n AS BIGINT) AS n_orders,
       CAST(c.rev AS DOUBLE) AS revenue,
       round(CAST(c.n AS DOUBLE) / CAST(b._bt AS DOUBLE), 9) AS band_share
FROM cell c JOIN bt b USING (value_band)
ORDER BY 1, 2
"""


def discount_return_association(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Return rate by discount depth: are heavily-discounted lines
    returned MORE (clearance-quality signal) or LESS (price-motivated
    keepers) — the merchandising cross nobody else computes
    (``realized_vs_retail_by_discount`` prices discounts,
    ``returns_impact_by_nation`` maps returns geographically; this
    crosses the two axes).

    Plan: ONE lineitem aggregate keyed on the integer percent band
    (round(l_discount·100) — exact, ≤ 11 cells), conditional counts
    and DECIMAL revenue; the return shares are 9dp divisions over the
    cell's own exact counts."""
    li = load_table(spark, sf_dir, "lineitem")
    vol = _vol()
    is_r = (F.col("l_returnflag") == "R").cast("long")
    cell = li.groupBy(
        F.round(F.col("l_discount") * 100, 0)
        .cast("int")
        .alias("discount_pct")
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(is_r).alias("n_returned"),
        F.sum(vol).alias("_rev"),
        F.sum(F.when(F.col("l_returnflag") == "R", vol)).alias("_rrev"),
    )
    return cell.select(
        "discount_pct",
        "n_lines",
        "n_returned",
        F.round(
            F.col("n_returned").cast("double")
            / F.col("n_lines").cast("double"),
            9,
        ).alias("return_line_share"),
        F.col("_rev").cast("double").alias("revenue"),
        F.round(
            F.col("_rrev").cast("double") / F.col("_rev").cast("double"), 9
        ).alias("returned_revenue_share"),
    ).orderBy("discount_pct")


DISCOUNT_RETURN_ORACLE = f"""
WITH cell AS (
  SELECT CAST(round(l_discount * 100, 0) AS INT) AS discount_pct,
         COUNT(*) AS n_lines,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_returned,
         SUM({_VOL_SQL}) AS rev,
         SUM(CASE WHEN l_returnflag = 'R' THEN {_VOL_SQL} END) AS rrev
  FROM lineitem GROUP BY 1
)
SELECT discount_pct,
       CAST(n_lines AS BIGINT) AS n_lines,
       CAST(n_returned AS BIGINT) AS n_returned,
       round(CAST(n_returned AS DOUBLE) / CAST(n_lines AS DOUBLE), 9)
         AS return_line_share,
       CAST(rev AS DOUBLE) AS revenue,
       round(CAST(rrev AS DOUBLE) / CAST(rev AS DOUBLE), 9)
         AS returned_revenue_share
FROM cell
ORDER BY discount_pct
"""


QUERIES = {
    "returns_impact_by_nation": returns_impact_by_nation,
    "order_line_count_value_curve": order_line_count_value_curve,
    "customer_yoy_retention_by_segment": customer_yoy_retention_by_segment,
    "nation_order_value_median_gap": nation_order_value_median_gap,
    "priority_settlement_lift": priority_settlement_lift,
    "brand_size_price_slope": brand_size_price_slope,
    "supplier_balance_late_bands": supplier_balance_late_bands,
    "unit_price_consistency_by_type": unit_price_consistency_by_type,
    "high_value_repeat_by_segment": high_value_repeat_by_segment,
    "order_value_band_status_mix": order_value_band_status_mix,
    "discount_return_association": discount_return_association,
}

ORACLES = {
    "returns_impact_by_nation": RETURNS_IMPACT_ORACLE,
    "order_line_count_value_curve": LINE_COUNT_CURVE_ORACLE,
    "customer_yoy_retention_by_segment": YOY_RETENTION_ORACLE,
    "nation_order_value_median_gap": MEDIAN_GAP_ORACLE,
    "priority_settlement_lift": SETTLEMENT_LIFT_ORACLE,
    "brand_size_price_slope": BRAND_SLOPE_ORACLE,
    "supplier_balance_late_bands": BALANCE_LATE_ORACLE,
    "unit_price_consistency_by_type": UNIT_PRICE_CV_ORACLE,
    "high_value_repeat_by_segment": HIGH_VALUE_REPEAT_ORACLE,
    "order_value_band_status_mix": BAND_STATUS_MIX_ORACLE,
    "discount_return_association": DISCOUNT_RETURN_ORACLE,
}
