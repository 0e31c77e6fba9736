"""Round-10 relational additions over the star schema: the skyline
(Pareto-frontier) operator, revenue-inequality (Gini) reporting, and
quarter-over-quarter growth — BI shapes the reference serves through
its warehouse SQL (reference README.md:17,27-31; SURVEY.md §2.7),
re-expressed as declarative DataFrame plans.

Determinism conventions match relational.py: money aggregates on
DECIMAL (exact), ratios/indices are single double divisions of exact
operands (or rounded on BOTH engines), every ordering ends in a
unique key.

Scale notes: the skyline avoids the quadratic dominance self-join via
a two-level decomposition (price-level max + a running max over
price levels) whose only window runs over DISTINCT PRICE LEVELS — a
domain-bounded set, not the corpus; Gini needs one rank window per
market segment (segments are an enum, spend rows are per-customer
aggregates, i.e. already reduced); QoQ growth's lag window runs over
(nation × quarter) aggregate rows — both window inputs shrink with
aggregation BEFORE any window sees them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..tables import load_table
from .relational import DEC, _dec
from .relational2 import _vol, _VOL_SQL


def parts_price_size_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of the parts catalog: the parts for which no
    other part is simultaneously cheaper-or-equal AND larger-or-equal
    (with at least one strict) — the classic SKYLINE operator
    ("best size for the money"; Börzsönyi, Kossmann & Stocker, "The
    Skyline Operator", ICDE 2001), which the reference would push to
    its warehouse as a quadratic NOT EXISTS.

    Algorithm (no quadratic self-join, no unpartitioned window):
    collapse to price LEVELS (per-price max size), bucket the levels
    by floor(price/100), and split "largest size strictly cheaper"
    into (a) the in-bucket running max — a window PARTITIONED by
    bucket — plus (b) the max over all strictly-cheaper buckets,
    computed with a triangular join over the per-bucket aggregate
    (tiny: one row per 100-wide price band, bounded by the price
    DOMAIN, not the catalog size).  A part survives iff its size
    beats that combined strictly-cheaper max AND no same-price part
    is strictly larger (size = its level's max).  Equal (price, size)
    twins don't dominate each other — both stay.

    Scale: TPC-H retail prices are near-unique per part, so a naive
    "window over price levels" would be a single-partition sort of
    the whole catalog; here every window is bucket-partitioned and
    the only global structure is the per-bucket max table (domain-
    bounded).  The DuckDB oracle uses the straightforward single
    global window over levels instead — two different decompositions
    must produce the same frontier."""
    part = load_table(spark, sf_dir, "part")
    lvl = part.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.max("p_size").alias("lvl_max")
    )
    lvl = lvl.withColumn("bucket", F.floor(F.col("price") / F.lit(100.0)))
    # (b) best size in any strictly-cheaper bucket: triangular join on
    # the per-bucket aggregate (one row per price band)
    bagg = lvl.groupBy("bucket").agg(F.max("lvl_max").alias("bmax"))
    prevb = (
        bagg.alias("a")
        .join(
            broadcast(bagg.alias("b")),
            F.col("b.bucket") < F.col("a.bucket"),
            "left",
        )
        .groupBy(F.col("a.bucket").alias("bucket"))
        .agg(F.max("b.bmax").alias("prev_bucket_max"))
    )
    # (a) best size at a strictly-cheaper price INSIDE the bucket
    w_in = Window.partitionBy("bucket").orderBy("price").rowsBetween(
        Window.unboundedPreceding, -1
    )
    lvl = (
        lvl.withColumn("in_prev", F.max("lvl_max").over(w_in))
        .join(broadcast(prevb), "bucket")
        .withColumn(
            "cheaper_max",
            F.greatest(
                F.coalesce(F.col("in_prev"), F.lit(-1)),
                F.coalesce(F.col("prev_bucket_max"), F.lit(-1)),
            ),
        )
    )
    return (
        part.join(lvl, part["p_retailprice"] == lvl["price"])
        .where(
            (F.col("p_size") == F.col("lvl_max"))
            & (F.col("p_size") > F.col("cheaper_max"))
        )
        .select("p_partkey", "p_name", "p_brand", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    )


PARTS_SKYLINE_ORACLE = """
WITH lvl AS (
  SELECT p_retailprice AS price, MAX(p_size) AS lvl_max
  FROM part GROUP BY 1
),
run AS (
  SELECT price, lvl_max,
         MAX(lvl_max) OVER (
           ORDER BY price ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prev_max
  FROM lvl
)
SELECT p.p_partkey, p.p_name, p.p_brand, p.p_retailprice, p.p_size
FROM part p JOIN run r ON p.p_retailprice = r.price
WHERE p.p_size = r.lvl_max AND (r.prev_max IS NULL OR p.p_size > r.prev_max)
ORDER BY p.p_retailprice, p.p_partkey
"""


def customer_gini_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue inequality per market segment: the Gini coefficient of
    per-customer total spend, by the exact rank formula
    G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over spends sorted ascending —
    the concentration metric behind "how dependent is this segment on
    its whales" (companion to ``revenue_pareto_top100`` /
    ``part_value_concentration``, which report top-k shares instead
    of the full-distribution index).

    Exactness: spends are DECIMAL sums; rank·spend products accumulate
    in DECIMAL(38,6) (exact — the rank is an integer), so the only
    float step is the final two-term formula, identical in both
    engines.  Equal spends make Σ i·xᵢ invariant to tie order, so no
    tiebreak is even needed for determinism (we still rank by
    (spend, custkey) to keep the plan's sort total).

    Scale: one orderkey-grain join, one per-customer aggregate, then a
    rank window PER SEGMENT over already-reduced per-customer rows —
    at 100 TB the window input is |customers|, not |lineitems|, and
    segments split it further."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    spend = (
        orders.groupBy("o_custkey")
        .agg(F.sum(_dec("o_totalprice")).alias("spend"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_mktsegment", "c_custkey", "spend")
    )
    w = Window.partitionBy("c_mktsegment").orderBy("spend", "c_custkey")
    ranked = spend.withColumn("r", F.row_number().over(w))
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("spend").cast("decimal(38,6)").alias("_sx"),
            F.sum(
                F.col("r").cast("decimal(38,6)") * F.col("spend").cast("decimal(38,6)")
            ).alias("_srx"),
        )
        .select(
            "c_mktsegment",
            "n_customers",
            F.round(F.col("_sx").cast("double"), 6).alias("total_spend"),
            F.round(
                F.lit(2.0) * F.col("_srx").cast("double")
                / (F.col("n_customers").cast("double") * F.col("_sx").cast("double"))
                - (F.col("n_customers") + 1).cast("double")
                / F.col("n_customers").cast("double"),
                9,
            ).alias("gini"),
        )
        .orderBy("c_mktsegment")
    )


CUSTOMER_GINI_ORACLE = """
WITH spend AS (
  SELECT c_mktsegment, c_custkey,
         SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS spend
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT c_mktsegment, spend,
         row_number() OVER (
           PARTITION BY c_mktsegment ORDER BY spend, c_custkey
         ) AS r
  FROM spend
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       round(CAST(SUM(CAST(spend AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_spend,
       round(
         2.0 * CAST(SUM(CAST(r AS DECIMAL(38,6)) * CAST(spend AS DECIMAL(38,6))) AS DOUBLE)
           / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(CAST(spend AS DECIMAL(38,6))) AS DOUBLE))
         - CAST(COUNT(*) + 1 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
         9
       ) AS gini
FROM ranked GROUP BY 1 ORDER BY 1
"""


def revenue_qoq_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarter-over-quarter revenue growth per customer nation: each
    (nation, quarter)'s discounted lineitem revenue and its growth
    rate against the nation's PREVIOUS observed quarter — the pacing
    report behind every "are we growing" dashboard tile.

    Revenue sums on DECIMAL; growth is (rev − prev)/prev as one
    double division of exact decimals (NULL for a nation's first
    quarter).  The lag window runs over (nation × quarter) aggregate
    rows — 25 nations × a calendar-bounded quarter count — never the
    fact table.

    Scale: one orderkey-grain fact join, customer/nation broadcast,
    partial-aggregatable groupBy; the window input is O(nations ×
    quarters) at any corpus size."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    quarter = F.concat(
        F.year("o_orderdate").cast("string"),
        F.lit("-Q"),
        F.quarter("o_orderdate").cast("string"),
    )
    cell = (
        li.join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), quarter.alias("quarter"))
        .agg(F.sum(_vol()).alias("_rev"))
    )
    w = Window.partitionBy("nation").orderBy("quarter")
    return (
        cell.withColumn("_prev", F.lag("_rev").over(w))
        .select(
            "nation",
            "quarter",
            F.round(F.col("_rev").cast("double"), 6).alias("revenue"),
            F.round(
                (F.col("_rev") - F.col("_prev")).cast("double")
                / F.col("_prev").cast("double"),
                9,
            ).alias("qoq_growth"),
        )
        .orderBy("nation", "quarter")
    )


REVENUE_QOQ_ORACLE = f"""
WITH cell AS (
  SELECT n_name AS nation,
         CAST(year(o_orderdate) AS VARCHAR) || '-Q' ||
           CAST(quarter(o_orderdate) AS VARCHAR) AS quarter,
         SUM({_VOL_SQL}) AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT nation, quarter,
       round(CAST(rev AS DOUBLE), 6) AS revenue,
       round(
         CAST(rev - lag(rev) OVER (PARTITION BY nation ORDER BY quarter) AS DOUBLE)
           / CAST(lag(rev) OVER (PARTITION BY nation ORDER BY quarter) AS DOUBLE),
         9
       ) AS qoq_growth
FROM cell ORDER BY nation, quarter
"""


def customer_repeat_within_90d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase activation per acquisition cohort: of the
    customers whose FIRST order lands in month m, how many placed a
    second order within 90 days of that first order — the onboarding
    KPI behind "do this quarter's new customers come back?"
    (``retention_cohorts`` answers this on the events stream; this is
    the star-schema revenue-side twin).

    Two aggregations, one self-reference resolved as a broadcast-able
    aggregate join: per-customer first-order date (partial-agg), then
    orders re-joined on custkey with the 90-day date predicate and
    counted per customer — no window touches order rows.  Counts are
    exact; the rate is one double division."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    firsts = orders.groupBy("o_custkey").agg(F.min("o_orderdate").alias("d0"))
    in_window = (
        orders.join(firsts, "o_custkey")
        .where(F.datediff(F.col("o_orderdate"), F.col("d0")) <= 90)
        .groupBy("o_custkey", "d0")
        .agg(F.count(F.lit(1)).alias("n_orders_90d"))
    )
    cohort = in_window.select(
        F.date_trunc("month", F.col("d0")).cast("date").alias("cohort_month"),
        (F.col("n_orders_90d") >= 2).cast("int").alias("repeated"),
    )
    return (
        cohort.groupBy("cohort_month")
        .agg(
            F.count(F.lit(1)).alias("n_new_customers"),
            F.sum("repeated").alias("n_repeat_90d"),
        )
        .select(
            "cohort_month",
            "n_new_customers",
            "n_repeat_90d",
            (
                F.col("n_repeat_90d").cast("double")
                / F.col("n_new_customers").cast("double")
            ).alias("repeat_rate"),
        )
        .orderBy("cohort_month")
    )


CUSTOMER_REPEAT_90D_ORACLE = """
WITH firsts AS (
  SELECT o_custkey, MIN(o_orderdate) AS d0 FROM orders GROUP BY 1
),
in_window AS (
  SELECT o.o_custkey, f.d0, COUNT(*) AS n_orders_90d
  FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
  WHERE date_diff('day', f.d0, o.o_orderdate) <= 90
  GROUP BY 1, 2
)
SELECT CAST(date_trunc('month', d0) AS DATE) AS cohort_month,
       CAST(COUNT(*) AS BIGINT) AS n_new_customers,
       CAST(SUM(CASE WHEN n_orders_90d >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeat_90d,
       CAST(SUM(CASE WHEN n_orders_90d >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS repeat_rate
FROM in_window GROUP BY 1 ORDER BY 1
"""


def order_composition_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-composition trend: per order month, the average number
    of lineitems, distinct parts, and total quantity per order — the
    "are baskets getting bigger or just more frequent" decomposition
    that pairs with ``revenue_qoq_growth`` (growth splits into
    orders × basket size × price; this reports the middle factor).

    One order-grain aggregate from the fact join (partial-agg: count,
    distinct-part count, quantity sum per order), one month rollup.
    Quantities sum on DECIMAL; every average is a single double
    division of exact operands."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    per_order = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.sum(_dec("l_quantity")).alias("qty"),
        )
    )
    return (
        per_order.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("n_items").alias("_items"),
            F.sum("n_parts").alias("_parts"),
            F.sum("qty").cast("decimal(38,6)").alias("_qty"),
        )
        .select(
            "month",
            "n_orders",
            (F.col("_items").cast("double") / F.col("n_orders").cast("double")).alias(
                "avg_items_per_order"
            ),
            (F.col("_parts").cast("double") / F.col("n_orders").cast("double")).alias(
                "avg_parts_per_order"
            ),
            F.round(
                F.col("_qty").cast("double") / F.col("n_orders").cast("double"), 9
            ).alias("avg_qty_per_order"),
        )
        .orderBy("month")
    )


ORDER_COMPOSITION_ORACLE = """
WITH per_order AS (
  SELECT o_orderkey, o_orderdate,
         COUNT(*) AS n_items,
         COUNT(DISTINCT l_partkey) AS n_parts,
         SUM(CAST(l_quantity AS DECIMAL(18,6))) AS qty
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
)
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(n_items) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_items_per_order,
       CAST(SUM(n_parts) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_parts_per_order,
       round(CAST(SUM(CAST(qty AS DECIMAL(38,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
         AS avg_qty_per_order
FROM per_order GROUP BY 1 ORDER BY 1
"""



def discount_by_quantity_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-discount policy audit: mean discount and realized unit
    price per quantity bucket (1–10, 11–20, …) — "do bigger baskets
    actually get better prices?"  The pricing-governance twin of
    ``discount_elasticity_by_priority`` (elasticity fits revenue
    against discount; this reads the discount POLICY itself off the
    quantity axis).

    One partial-aggregatable groupBy over the fact scan; discounts
    and prices sum on DECIMAL, each mean is one double division; the
    bucket key is exact integer arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.least(
        F.floor((F.col("l_quantity") - 1) / 10).cast("long"), F.lit(4)
    )
    unit_price = _dec("l_extendedprice")
    return (
        li.groupBy(bucket.alias("qty_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(_dec("l_discount")).alias("_d"),
            F.sum(unit_price).alias("_p"),
            F.sum(_dec("l_quantity")).alias("_q"),
        )
        .select(
            "qty_bucket",
            "n_lines",
            F.round(F.col("_d").cast("double") / F.col("n_lines").cast("double"), 9).alias(
                "mean_discount"
            ),
            F.round(F.col("_p").cast("double") / F.col("_q").cast("double"), 9).alias(
                "mean_unit_price"
            ),
        )
        .orderBy("qty_bucket")
    )


DISCOUNT_BY_QTY_ORACLE = """
SELECT LEAST(CAST(floor((l_quantity - 1) / 10) AS BIGINT), 4) AS qty_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       round(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 9) AS mean_discount,
       round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 9)
         AS mean_unit_price
FROM lineitem GROUP BY 1 ORDER BY 1
"""


def order_value_lognormal_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-of-moments LOG-NORMAL fit of order values per market
    segment: μ = mean(ln x), σ² = E[ln²x] − μ², with the implied
    median e^μ — the parametric summary behind capacity planning and
    synthetic-data generation ("orders are log-normal with these
    parameters"), complementing ``value_histogram``'s non-parametric
    shape and ``benford_price_audit``'s digit test.

    Determinism: each ln(o_totalprice) is rounded to 9 dp on BOTH
    engines and accumulated as DECIMAL(18,9) (squares in
    DECIMAL(37,18)) — exact sums whatever the aggregation order; μ,
    σ, and e^μ are then identical float expressions of identical
    exact inputs, rounded at the edge."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    lnx = F.round(F.log(F.col("o_totalprice").cast("double")), 9).cast(
        "decimal(18,9)"
    )
    per_seg = (
        orders.join(
            cust.select("c_custkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_mktsegment", lnx.alias("lnx"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("lnx").alias("_s1"),
            F.sum(F.col("lnx") * F.col("lnx")).alias("_s2"),
        )
    )
    mu = F.col("_s1").cast("double") / F.col("n_orders").cast("double")
    sigma2 = F.col("_s2").cast("double") / F.col("n_orders").cast("double") - mu * mu
    return per_seg.select(
        "c_mktsegment",
        "n_orders",
        F.round(mu, 9).alias("mu"),
        F.round(F.sqrt(sigma2), 9).alias("sigma"),
        F.round(F.exp(mu), 6).alias("implied_median"),
    ).orderBy("c_mktsegment")


ORDER_LOGNORMAL_ORACLE = """
WITH obs AS (
  SELECT c_mktsegment,
         CAST(round(ln(CAST(o_totalprice AS DOUBLE)), 9) AS DECIMAL(18,9)) AS lnx
  FROM orders JOIN customer ON o_custkey = c_custkey
),
agg AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         SUM(lnx) AS s1,
         SUM(lnx * lnx) AS s2
  FROM obs GROUP BY 1
)
SELECT c_mktsegment, n_orders,
       round(CAST(s1 AS DOUBLE) / CAST(n_orders AS DOUBLE), 9) AS mu,
       round(sqrt(CAST(s2 AS DOUBLE) / CAST(n_orders AS DOUBLE)
                  - (CAST(s1 AS DOUBLE) / CAST(n_orders AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n_orders AS DOUBLE))), 9) AS sigma,
       round(exp(CAST(s1 AS DOUBLE) / CAST(n_orders AS DOUBLE)), 6) AS implied_median
FROM agg ORDER BY c_mktsegment
"""



def brand_repeat_loyalty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand loyalty: per part brand, the share of its buyers who came
    back for the SAME brand in a second distinct order — the repeat
    metric merchandising teams rank assortments by (the brand-grain
    refinement of ``customer_repeat_within_90d``'s store-wide rate).

    One fact join with a broadcast part dim, a (brand, customer)
    distinct-order aggregate (partial-agg), then a brand rollup —
    counts exact, the rate one double division."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per = (
        li.join(part.select("p_partkey", "p_brand"), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("p_brand", "o_custkey")
        .agg(F.countDistinct("l_orderkey").alias("n_orders"))
    )
    return (
        per.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_buyers"),
            F.sum((F.col("n_orders") >= 2).cast("long")).alias("repeat_buyers"),
        )
        .select(
            "p_brand",
            "n_buyers",
            "repeat_buyers",
            (
                F.col("repeat_buyers").cast("double") / F.col("n_buyers").cast("double")
            ).alias("repeat_rate"),
        )
        .orderBy("p_brand")
    )


BRAND_REPEAT_ORACLE = """
WITH per AS (
  SELECT p_brand, o_custkey, COUNT(DISTINCT l_orderkey) AS n_orders
  FROM lineitem
  JOIN part   ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_buyers,
       CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS repeat_buyers,
       CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS repeat_rate
FROM per GROUP BY 1 ORDER BY 1
"""


def domestic_supply_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-chain localization: per customer nation, the share of
    purchase revenue supplied by that SAME nation's suppliers — the
    single-number localization KPI that ``nation_trade_balance``
    decomposes into separate earned/spent flows (TPC-H Q5 measures
    only the domestic slice; this reports it AGAINST the total).

    One orderkey-grain fact join; supplier/customer/nation dims
    broadcast; revenue sums on DECIMAL split by an exact nationkey
    equality flag — one pass, no second scan for the denominator."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    vol = _vol()
    agg = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("c_nationkey")
        .agg(
            F.sum(vol).alias("_total"),
            F.sum(
                F.when(F.col("c_nationkey") == F.col("s_nationkey"), vol).otherwise(
                    F.lit(0).cast(DEC)
                )
            ).alias("_domestic"),
        )
    )
    return (
        agg.join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.round(F.col("_total").cast("double"), 6).alias("total_revenue"),
            F.round(F.col("_domestic").cast("double"), 6).alias("domestic_revenue"),
            F.round(
                F.col("_domestic").cast("double") / F.col("_total").cast("double"), 9
            ).alias("domestic_share"),
        )
        .orderBy("nation")
    )


DOMESTIC_SUPPLY_ORACLE = f"""
WITH agg AS (
  SELECT c_nationkey,
         SUM({_VOL_SQL}) AS total,
         SUM(CASE WHEN c_nationkey = s_nationkey THEN {_VOL_SQL}
                  ELSE CAST(0 AS DECIMAL(18,6)) END) AS domestic
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1
)
SELECT n_name AS nation,
       round(CAST(total AS DOUBLE), 6) AS total_revenue,
       round(CAST(domestic AS DOUBLE), 6) AS domestic_revenue,
       round(CAST(domestic AS DOUBLE) / CAST(total AS DOUBLE), 9) AS domestic_share
FROM agg JOIN nation ON c_nationkey = n_nationkey
ORDER BY nation
"""



def supplier_latency_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delivery CONSISTENCY per supplier: mean and standard deviation
    of order-to-ship latency (days), top 25 highest-volume suppliers —
    procurement cares about variance as much as speed (a supplier
    averaging 40±2 days beats one averaging 35±25 for planning), the
    spread companion to ``supplier_reliability_wilson``'s on-time
    rate.

    Latencies are exact integer day counts; n, Σd, Σd² accumulate
    exactly, so mean and the population σ = sqrt(Σd²/n − (Σd/n)²)
    are identical float expressions of identical exact inputs,
    rounded at the edge.  One fact join + one supplier-grain
    aggregate; the top-25 is TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    d = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("long")
    agg = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_shipments"),
            F.sum(d).alias("_s1"),
            F.sum(d * d).alias("_s2"),
        )
    )
    mean = F.col("_s1").cast("double") / F.col("n_shipments").cast("double")
    var = F.col("_s2").cast("double") / F.col("n_shipments").cast("double") - mean * mean
    return (
        agg.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            "n_shipments",
            F.round(mean, 9).alias("mean_latency_days"),
            F.round(F.sqrt(var), 9).alias("stddev_latency_days"),
        )
        .orderBy(F.desc("n_shipments"), "s_suppkey")
        .limit(25)
    )


SUPPLIER_CONSISTENCY_ORACLE = """
WITH agg AS (
  SELECT l_suppkey,
         CAST(COUNT(*) AS BIGINT) AS n_shipments,
         SUM(CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT)) AS s1,
         SUM(CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT)
             * CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT)) AS s2
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1
)
SELECT s_suppkey, s_name, n_shipments,
       round(CAST(s1 AS DOUBLE) / CAST(n_shipments AS DOUBLE), 9)
         AS mean_latency_days,
       round(sqrt(CAST(s2 AS DOUBLE) / CAST(n_shipments AS DOUBLE)
                  - (CAST(s1 AS DOUBLE) / CAST(n_shipments AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n_shipments AS DOUBLE))), 9)
         AS stddev_latency_days
FROM agg JOIN supplier ON l_suppkey = s_suppkey
ORDER BY n_shipments DESC, s_suppkey
LIMIT 25
"""



QUERIES = {
    "supplier_latency_consistency": supplier_latency_consistency,
    "brand_repeat_loyalty": brand_repeat_loyalty,
    "domestic_supply_share": domestic_supply_share,
    "discount_by_quantity_bucket": discount_by_quantity_bucket,
    "order_value_lognormal_fit": order_value_lognormal_fit,
    "customer_repeat_within_90d": customer_repeat_within_90d,
    "order_composition_trend": order_composition_trend,
    "parts_price_size_skyline": parts_price_size_skyline,
    "customer_gini_by_segment": customer_gini_by_segment,
    "revenue_qoq_growth": revenue_qoq_growth,
}

ORACLES = {
    "supplier_latency_consistency": SUPPLIER_CONSISTENCY_ORACLE,
    "brand_repeat_loyalty": BRAND_REPEAT_ORACLE,
    "domestic_supply_share": DOMESTIC_SUPPLY_ORACLE,
    "discount_by_quantity_bucket": DISCOUNT_BY_QTY_ORACLE,
    "order_value_lognormal_fit": ORDER_LOGNORMAL_ORACLE,
    "customer_repeat_within_90d": CUSTOMER_REPEAT_90D_ORACLE,
    "order_composition_trend": ORDER_COMPOSITION_ORACLE,
    "parts_price_size_skyline": PARTS_SKYLINE_ORACLE,
    "customer_gini_by_segment": CUSTOMER_GINI_ORACLE,
    "revenue_qoq_growth": REVENUE_QOQ_ORACLE,
}
