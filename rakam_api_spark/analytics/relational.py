"""TPC-H-style relational queries over the star schema.

The reference executes none of these in-engine — it delegates every
join/aggregation/window to Postgres or Presto (reference
README.md:17,27-31; SURVEY.md §2.7).  On Spark this surface is
Catalyst's home turf; the implementations below are deliberately
declarative so pushdown/pruning/broadcast decisions stay with the
optimizer.

Determinism conventions (so results hash-match the DuckDB oracle):
- money aggregates are computed on DECIMAL(18,6) casts (exact,
  order-insensitive) and emitted as DOUBLE;
- every top-k uses row_number() over a total order that ends in a
  unique key;
- ratios are double divisions of exactly-equal operands.

Scale notes: nation/region (constant 25/5 rows) and scalar derived
frames keep explicit ``broadcast()`` hints; customer/supplier/part-
grain join sides carry NO hint, because they GROW with scale factor
— AQE's runtime size check picks broadcast-hash at any realistic
dim:fact ratio and falls back to shuffle join when a 100 TB
dimension would not fit, where a forced hint would override the size
check (the relational6 convention, adopted fleet-wide in round 15).
lineitem⋈orders is a fact-fact join on the natural key; at 100 TB
both sides would be bucketed by orderkey, and AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..tables import load_table

DEC = "decimal(18,6)"


def _dec(c):
    return F.col(c).cast(DEC)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 adapted: pricing summary report over lineitem.

    Single scan + partial-aggregatable agg: one shuffle on the tiny
    (returnflag, linestatus) key space; parquet scan prunes to the 7
    referenced columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-09-02").cast("date")
    return (
        li.where(F.col("l_shipdate").cast("date") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum((_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))).cast(DEC))
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                (
                    _dec("l_extendedprice")
                    * (F.lit(1).cast(DEC) - _dec("l_discount"))
                    * (F.lit(1).cast(DEC) + _dec("l_tax"))
                ).cast(DEC)
            )
            .cast("double")
            .alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) * (CAST(1 AS DECIMAL(18,6)) + CAST(l_tax AS DECIMAL(18,6))) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 adapted: top-10 unshipped orders by revenue.

    The customer join is un-hinted (AQE broadcasts it at any
    realistic size); orders⋈lineitem shuffles on orderkey.  The
    final top-10 uses ``orderBy().limit()`` which
    Spark plans as TakeOrderedAndProject: each partition keeps its
    local top-10 and the driver merges 10·numPartitions rows — no
    single-partition WindowExec even when the l_orderkey-grain
    aggregate has millions of rows at scale.
    """
    cu = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cut = F.lit("1995-03-15").cast("date")
    joined = (
        li.where(F.col("l_shipdate").cast("date") > cut)
        .join(orders.where(F.col("o_orderdate").cast("date") < cut), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu.where(F.col("c_mktsegment") == "BUILDING"), F.col("o_custkey") == F.col("c_custkey"))
    )
    agg = joined.groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate")).agg(
        F.sum((_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))).cast(DEC))
        .cast("double")
        .alias("revenue")
    )
    return agg.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10)


Q3_ORACLE = """
WITH agg AS (
  SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND CAST(o_orderdate AS DATE) < DATE '1995-03-15'
    AND CAST(l_shipdate AS DATE) > DATE '1995-03-15'
  GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
)
SELECT l_orderkey, o_orderdate, revenue
FROM (SELECT *, row_number() OVER (ORDER BY revenue DESC, l_orderkey ASC) AS rn FROM agg)
WHERE rn <= 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 adapted: revenue per nation where the supplying and
    ordering nations match.  nation/region broadcast (constant);
    customer/supplier joins un-hinted around the lineitem⋈orders
    fact join."""
    for n in ("region", "nation", "customer", "supplier"):
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = broadcast(spark.table("nation"))
    region = broadcast(spark.table("region"))
    cust = spark.table("customer")
    supp = spark.table("supplier")
    df = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name").isin("ASIA", "AMERICA"))
    )
    return (
        df.groupBy("r_name", "n_name")
        .agg(
            F.sum((_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))).cast(DEC))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("r_name", "n_name")
    )


Q5_ORACLE = """
SELECT r_name, n_name,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA','AMERICA')
GROUP BY r_name, n_name
"""


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by lifetime order value (customer ⟕ orders).

    ``orderBy().limit()`` → TakeOrderedAndProject: per-partition
    top-20 + driver merge, instead of funnelling the whole aggregate
    through one WindowExec partition.
    """
    cu = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    agg = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        agg.select("c_custkey", "c_name", "c_mktsegment", "total_spend", "n_orders")
        .orderBy(F.desc("total_spend"), F.asc("c_custkey"))
        .limit(20)
    )


TOP_CUSTOMERS_ORACLE = """
WITH agg AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_spend,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
)
SELECT c_custkey, c_name, c_mktsegment, total_spend, n_orders
FROM (
  SELECT c_custkey, c_name, c_mktsegment, total_spend, n_orders,
         row_number() OVER (ORDER BY total_spend DESC, c_custkey ASC) AS rn
  FROM agg JOIN customer ON o_custkey = c_custkey
) WHERE rn <= 20
"""


def part_type_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue and volume per part type (part dim broadcast into the
    lineitem fact scan)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type")
        .agg(
            F.sum((_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))).cast(DEC))
            .cast("double")
            .alias("revenue"),
            F.sum(_dec("l_quantity")).cast("double").alias("total_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("p_type")
    )


PART_TYPE_MARGIN_ORACLE = """
SELECT p_type,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_type
"""


def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(status, priority) — grouping-set aggregation the
    reference could only get from its warehouse."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_value"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


ORDERS_ROLLUP_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


def order_rank_in_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: each customer's top-3 orders by price.
    Partitioned window — shuffles once on o_custkey."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
            "rnk",
        )
    )


ORDER_RANK_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice AS price, rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join keeping customers with zero orders (outer-join +
    coalesce surface)."""
    cu = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
    )
    return cu.join(agg, F.col("c_custkey") == F.col("o_custkey"), "left").select(
        "c_custkey",
        F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("sum_price"), F.lit(0.0)).alias("total_value"),
        "last_order",
    )


CUSTOMER_ORDER_STATS_ORACLE = """
SELECT c_custkey,
       CAST(COALESCE(cnt, 0) AS BIGINT) AS n_orders,
       COALESCE(sum_price, 0.0) AS total_value,
       last_order
FROM customer
LEFT JOIN (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
         MAX(CAST(o_orderdate AS DATE)) AS last_order
  FROM orders GROUP BY o_custkey
) ON c_custkey = o_custkey
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 adapted: pure filter + global aggregate.

    The pushdown showcase: all three predicates and the 4-column
    projection reach the parquet scan (PushedFilters in explain);
    no shuffle at all — partial aggregates combine in one exchange
    of a single row per partition.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((_dec("l_extendedprice") * _dec("l_discount")).cast(DEC))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_ORACLE = """
SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.05
  AND l_quantity < 24
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted: LEFT SEMI join (EXISTS) — orders in 1996
    having at least one returned lineitem, counted by priority.

    Semi join avoids materializing the multiplicity of the fact-fact
    join; Catalyst picks broadcast/shuffled-hash by stats, and at
    100 TB the distinct-orderkey build side stays far smaller than
    the full lineitem join.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    returned = li.where(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.where(
            (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("o_orderdate").cast("date") < F.lit("1997-01-01").cast("date"))
        )
        .join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def customers_no_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no order on/after 2000-01-01,
    summarized per market segment."""
    cu = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    recent = orders.where(
        F.col("o_orderdate").cast("date") >= F.lit("2000-01-01").cast("date")
    ).select("o_custkey")
    return (
        cu.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("sum_acctbal"),
        )
    )


ANTI_JOIN_ORACLE = """
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND CAST(o.o_orderdate AS DATE) >= DATE '2000-01-01')
GROUP BY c_mktsegment
"""


def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, order year): all four grouping combinations
    in one pass (Spark expands grouping sets map-side — one shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    yr = F.year(F.col("o_orderdate").cast("date")).alias("order_year")
    return (
        orders.select("o_orderstatus", yr, "o_totalprice")
        .cube("o_orderstatus", "order_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
        )
    )


ORDERS_CUBE_ORACLE = """
SELECT o_orderstatus, CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS INT) AS order_year,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, order_year)
"""


def engaged_user_days_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations on (user, day) activity sets: days a user both
    clicked AND purchased (INTERSECT), minus days with an error
    (EXCEPT).  Distinct-based set ops shuffle once on the composite
    key."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select("user_id", F.col("ts").cast("date").alias("day"), "event_type")

    def days(t: str) -> DataFrame:
        return base.where(F.col("event_type") == t).select("user_id", "day").distinct()

    return days("click").intersect(days("purchase")).subtract(days("error"))


SETOPS_ORACLE = """
SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id, CAST(ts AS DATE) FROM events WHERE event_type = 'purchase'
EXCEPT
SELECT user_id, CAST(ts AS DATE) FROM events WHERE event_type = 'error'
"""


def revenue_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ad-hoc SQL surface: the reference's 'analyze with your SQL
    queries' workflow (reference README.md:17) — raw SQL over
    registered views, exercising GROUPING SETS (a grouping shape
    distinct from the rollup/cube operators) plus a dimension join.
    """
    from ..tables import register_views

    register_views(spark, sf_dir, names=("orders", "customer", "nation"))
    return spark.sql(
        """
        SELECT n.n_name AS nation,
               c.c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY GROUPING SETS ((n.n_name), (c.c_mktsegment), (n.n_name, c.c_mktsegment))
        """
    )


GROUPING_SETS_SQL_ORACLE = """
SELECT n.n_name AS nation,
       c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
GROUP BY GROUPING SETS ((n.n_name), (c.c_mktsegment), (n.n_name, c.c_mktsegment))
"""


def cheapest_order_per_customer_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q2's shape): each customer's
    order(s) at their personal minimum price.  Catalyst rewrites the
    correlated subquery into an aggregate + join — free optimizer
    machinery the reference delegates to Presto."""
    from ..tables import register_views

    register_views(spark, sf_dir, names=("orders",))
    return spark.sql(
        """
        SELECT o.o_custkey, o.o_orderkey, o.o_totalprice
        FROM orders o
        WHERE o.o_totalprice = (
            SELECT MIN(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


CHEAPEST_ORDER_ORACLE = """
SELECT o.o_custkey, o.o_orderkey, o.o_totalprice
FROM orders o
WHERE o.o_totalprice = (
    SELECT MIN(o2.o_totalprice) FROM orders o2
    WHERE o2.o_custkey = o.o_custkey
)
"""


def part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11's shape: per-part revenue filtered against a global
    scalar aggregate (HAVING value > 1.5 × average part value).

    The comparison is done in EXACT integer-scaled decimal arithmetic
    (2·n·v > 3·total) — no decimal division, AND with operand
    precisions bounded so NEITHER engine's product exceeds decimal
    width 38 (Spark would silently rescale an overflowing product to
    scale 6, truncating genuine scale-12 digits; with (26,12)×(1,0)
    ×(8,0) the result is (37,12) — exact in both engines).  The
    totals frame is one row → broadcast; the per-part aggregation is
    the only shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount")))
        .cast("decimal(26,12)")
        .alias("v")
    )
    totals = pv.agg(
        F.sum("v").cast("decimal(30,12)").alias("total"), F.count(F.lit(1)).alias("n_parts")
    )
    lhs = (
        F.col("v")
        * F.lit(2).cast("decimal(1,0)")
        * F.col("n_parts").cast("decimal(8,0)")
    )
    return (
        pv.crossJoin(broadcast(totals))
        .where(lhs > F.col("total") * F.lit(3).cast("decimal(1,0)"))
        .select(
            "l_partkey",
            # re-scale to DECIMAL(18,6) before the double cast: the
            # engines' scale-12→double conversions round differently
            # in the last ulp, scale-6 conversions agree (the repo's
            # money convention)
            F.col("v").cast(DEC).cast("double").alias("part_value"),
            (F.col("v").cast(DEC).cast("double") / F.col("total").cast(DEC).cast("double")).alias(
                "value_share"
            ),
        )
        .orderBy("l_partkey")
    )


PART_VALUE_CONCENTRATION_ORACLE = """
WITH pv AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                  * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
              AS DECIMAL(26,12)) AS v
  FROM lineitem GROUP BY 1
),
totals AS (SELECT CAST(SUM(v) AS DECIMAL(30,12)) AS total, COUNT(*) AS n_parts FROM pv)
SELECT l_partkey, CAST(CAST(v AS DECIMAL(18,6)) AS DOUBLE) AS part_value,
       CAST(CAST(v AS DECIMAL(18,6)) AS DOUBLE)
         / CAST(CAST(total AS DECIMAL(18,6)) AS DOUBLE) AS value_share
FROM pv, totals
WHERE v * CAST(2 AS DECIMAL(1,0)) * CAST(n_parts AS DECIMAL(8,0))
      > total * CAST(3 AS DECIMAL(1,0))
"""


def big_ticket_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18's shape: orders whose total lineitem quantity
    exceeds a threshold — a semi-join of the orders table against a
    grouped-HAVING set, plus a broadcast customer lookup.

    At scale the heavy side (lineitem) aggregates map-side before its
    one shuffle on l_orderkey; orders joins the (small) qualifying
    set, so the orders table is never shuffled on a new key.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    qualifying = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > F.lit(250).cast(DEC))
    )
    return (
        orders.join(qualifying, orders.o_orderkey == qualifying.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_date"),
            F.col("o_totalprice").alias("o_totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy("o_orderkey")
    )


BIG_TICKET_ORDERS_ORACLE = """
WITH qualifying AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,6))) AS total_qty
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 250
)
SELECT c.c_name, o.o_orderkey, CAST(o.o_orderdate AS DATE) AS o_date,
       o.o_totalprice, CAST(q.total_qty AS DOUBLE) AS total_qty
FROM orders o
JOIN qualifying q ON o.o_orderkey = q.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


def late_sole_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's shape: suppliers who were the ONLY late shipper in
    a multi-supplier order (lateness ≡ l_shipdate more than 60 days
    after o_orderdate — this schema carries no receipt/commit dates).

    The EXISTS / NOT EXISTS pair is expressed as ONE order-grain
    aggregation: per order, the distinct-supplier set and the
    distinct set of suppliers with a late line (both bounded by the
    handful of suppliers an order touches), filtered to multi-
    supplier orders whose late set is a singleton.  r16: replaces
    the former (order, supplier)-grain aggregate + order-grain
    re-aggregate + self-join — the per-(order,supplier) max(late)
    is subsumed by the late-supplier SET, collapsing two exchanges
    and a double-computed aggregate branch into one exchange
    (guide §2.4); collect_set partially aggregates map-side, so the
    shuffle carries per-order supplier sets, never line rows.
    Top-10 by a total order ending in the unique supplier name.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    late_supp = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        F.col("l_suppkey"),
    )
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.collect_set("l_suppkey").alias("_all_s"),
            F.collect_set(late_supp).alias("_late_s"),
        )
        .where((F.size("_all_s") >= 2) & (F.size("_late_s") == 1))
    )
    sole_late = (
        per_order.select(F.element_at("_late_s", 1).alias("l_suppkey"))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return (
        sole_late.join(supp, sole_late.l_suppkey == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


LATE_SOLE_SUPPLIER_ORACLE = """
WITH ps AS (
  SELECT l.l_orderkey, l.l_suppkey,
         MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
po AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late FROM ps GROUP BY 1
),
sole AS (
  SELECT ps.l_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
  FROM ps JOIN po USING (l_orderkey)
  WHERE ps.late = 1 AND po.n_supp >= 2 AND po.n_late = 1
  GROUP BY 1
)
SELECT s.s_name, numwait
FROM sole JOIN supplier s ON sole.l_suppkey = s.s_suppkey
ORDER BY numwait DESC, s.s_name ASC
LIMIT 10
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 adapted: shipping volume between a nation pair, per
    direction and ship year.

    Plan shape: the lineitem⋈orders fact join shuffles on orderkey;
    customer/supplier/nation are broadcast dims, and the nation-pair
    predicate prunes rows during the broadcast hash joins — the only
    wide shuffle is the fact join, the final group-by key space is
    2 directions × years."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n_supp = broadcast(
        nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    )
    n_cust = broadcast(
        nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    df = (
        li.where(F.col("l_shipdate").cast("date").between("1995-01-01", "1996-12-31"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(n_supp, F.col("s_nationkey") == F.col("sn_key"))
        .join(n_cust, F.col("c_nationkey") == F.col("cn_key"))
        .where(pair)
    )
    return (
        df.groupBy("supp_nation", "cust_nation", F.year(F.col("l_shipdate").cast("date")).alias("l_year"))
        .agg(
            F.sum((_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))).cast(DEC))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM CAST(l_shipdate AS DATE)) AS INT) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
)
GROUP BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 adapted: NATION_3's share of ECONOMY-part order
    volume delivered into the AMERICA region, per order year.

    The share is a double division of two exactly-aggregated decimal
    sums (conditional numerator via a CASE inside the same
    aggregation — one pass, no self-join)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n_cust = broadcast(
        nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key"))
    )
    n_supp = broadcast(
        nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    )
    vol = (_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))).cast(DEC)
    df = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(part.where(F.col("p_type").startswith("ECONOMY")), F.col("l_partkey") == F.col("p_partkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n_cust, F.col("c_nationkey") == F.col("cn_key"))
        .join(broadcast(region.where(F.col("r_name") == "AMERICA")), F.col("cr_key") == F.col("r_regionkey"))
        .join(n_supp, F.col("s_nationkey") == F.col("sn_key"))
        .where(F.col("o_orderdate").cast("date").between("1995-01-01", "1996-12-31"))
    )
    return (
        df.groupBy(F.year(F.col("o_orderdate").cast("date")).alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0).cast(DEC)))
            .cast("double")
            .alias("nation_volume"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
        .withColumn("mkt_share", F.col("nation_volume") / F.col("total_volume"))
        .orderBy("o_year")
    )


Q8_ORACLE = """
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS nation_volume,
       CAST(SUM(vol) AS DOUBLE) AS total_volume,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
         / CAST(SUM(vol) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) AS INT) AS o_year,
         CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS vol,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN part     ON l_partkey = p_partkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA'
    AND p_type LIKE 'ECONOMY%'
    AND CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
)
GROUP BY o_year
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 adapted: share of revenue from PROMO parts in one
    ship month — conditional aggregation over the part-broadcast
    join, one output row."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    vol = (_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))).cast(DEC)
    df = (
        li.where(
            (F.col("l_shipdate").cast("date") >= F.lit("1995-09-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1995-10-01").cast("date"))
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
    )
    return df.agg(
        F.sum(F.when(F.col("p_type").startswith("PROMO"), vol).otherwise(F.lit(0).cast(DEC)))
        .cast("double")
        .alias("promo_revenue"),
        F.sum(vol).cast("double").alias("total_revenue"),
    ).withColumn(
        "promo_share",
        F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"),
    )


Q14_ORACLE = """
SELECT
  CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN vol ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS promo_revenue,
  CAST(SUM(vol) AS DOUBLE) AS total_revenue,
  100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN vol ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
        / CAST(SUM(vol) AS DOUBLE) AS promo_share
FROM (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS vol,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE CAST(l_shipdate AS DATE) >= DATE '1995-09-01'
    AND CAST(l_shipdate AS DATE) <  DATE '1995-10-01'
)
"""


def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted: per market segment, customers whose account
    balance beats the positive-balance average but who have gone
    idle (no orders since 1998 — every synthetic customer has SOME
    order, so 'never ordered' would be a vacuous gate).

    Plan shape: the global average is ONE scalar aggregation
    cross-joined (broadcast) into the customer scan — never a
    correlated per-row subquery; the idle test is a left-anti join
    on custkey against the date-filtered orders (the filter pushes
    to the orders scan).  The threshold is a double division of an
    exact decimal sum, and balance sums are decimal-exact, so
    results are order-insensitive."""
    cu = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    thr = cu.where(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    recent = orders.where(
        F.col("o_orderdate").cast("date") >= F.lit("1998-01-01").cast("date")
    ).select("o_custkey")
    return (
        cu.crossJoin(broadcast(thr))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_balance"),
        )
        .orderBy("c_mktsegment")
    )


Q22_ORACLE = """
WITH thr AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_balance
FROM customer, thr
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND CAST(o_orderdate AS DATE) >= DATE '1998-01-01'
  )
GROUP BY c_mktsegment
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_revenue": q5_region_revenue,
    "top_customers": top_customers,
    "part_type_margin": part_type_margin,
    "orders_rollup": orders_rollup,
    "order_rank_in_customer": order_rank_in_customer,
    "customer_order_stats": customer_order_stats,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q4_order_priority": q4_order_priority,
    "customers_no_recent_orders": customers_no_recent_orders,
    "orders_cube": orders_cube,
    "engaged_user_days_setops": engaged_user_days_setops,
    "revenue_grouping_sets_sql": revenue_grouping_sets_sql,
    "cheapest_order_per_customer_sql": cheapest_order_per_customer_sql,
    "part_value_concentration": part_value_concentration,
    "big_ticket_orders": big_ticket_orders,
    "late_sole_supplier": late_sole_supplier,
    "q7_nation_volume": q7_nation_volume,
    "q8_market_share": q8_market_share,
    "q14_promo_revenue": q14_promo_revenue,
    "q22_idle_balances": q22_idle_balances,
}

ORACLES = {
    "q1_pricing_summary": Q1_ORACLE,
    "q3_shipping_priority": Q3_ORACLE,
    "q5_region_revenue": Q5_ORACLE,
    "top_customers": TOP_CUSTOMERS_ORACLE,
    "part_type_margin": PART_TYPE_MARGIN_ORACLE,
    "orders_rollup": ORDERS_ROLLUP_ORACLE,
    "order_rank_in_customer": ORDER_RANK_ORACLE,
    "customer_order_stats": CUSTOMER_ORDER_STATS_ORACLE,
    "q6_forecast_revenue": Q6_ORACLE,
    "q4_order_priority": Q4_ORACLE,
    "customers_no_recent_orders": ANTI_JOIN_ORACLE,
    "orders_cube": ORDERS_CUBE_ORACLE,
    "engaged_user_days_setops": SETOPS_ORACLE,
    "revenue_grouping_sets_sql": GROUPING_SETS_SQL_ORACLE,
    "cheapest_order_per_customer_sql": CHEAPEST_ORDER_ORACLE,
    "part_value_concentration": PART_VALUE_CONCENTRATION_ORACLE,
    "big_ticket_orders": BIG_TICKET_ORDERS_ORACLE,
    "late_sole_supplier": LATE_SOLE_SUPPLIER_ORACLE,
    "q7_nation_volume": Q7_ORACLE,
    "q8_market_share": Q8_ORACLE,
    "q14_promo_revenue": Q14_ORACLE,
    "q22_idle_balances": Q22_ORACLE,
}
