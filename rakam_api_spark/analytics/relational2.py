"""Remaining TPC-H-style query shapes over the star schema.

Together with ``relational.py`` this completes the full 22-query
TPC-H sweep (adapted to the synthetic schema, which has no partsupp
table and no commit/receipt dates — supply relationships are derived
from lineitem, and lateness from shipdate vs orderdate).  The
reference delegates all of this to Postgres/Presto (reference
README.md:17,27-31; SURVEY.md §2.7); here every query is a
declarative DataFrame plan so Catalyst keeps pushdown / pruning /
broadcast decisions.

Determinism conventions match relational.py: money aggregates on
DECIMAL(18,6); thresholds via exact integer-valued-double math;
every top-k a total order ending in a unique key, planned as
TakeOrderedAndProject via ``orderBy().limit()``.

Scale notes: nation/region (constant 25/5 rows) and single-row /
enum-sized derived frames keep explicit ``broadcast()`` hints;
part/supplier/customer-grain sides — raw, filtered, or per-key
aggregates — carry NO hint, because they GROW with scale factor
(part ≈ SF×200k): AQE's runtime size check picks broadcast-hash at
any realistic dim:fact ratio and falls back to shuffle join when a
100 TB dimension would not fit, where a forced hint would override
the size check (the relational6.py convention, VERDICT r13/r14).
The only wide shuffles are lineitem⋈orders fact joins on orderkey
and the (partkey, suppkey)-grain aggregations, both
partial-aggregatable map-side.  No query funnels an unbounded row
set through a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..tables import load_table
from .relational import DEC, _dec


def _vol():
    return (_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))).cast(DEC)


_VOL_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * "
    "(CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))"
)


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted: for each part of size 15, the EUROPE
    supplier(s) achieving the minimum observed unit price.

    Without a partsupp table the supply cost is derived from
    lineitem: unit_cost(part, supp) = MIN(l_extendedprice /
    l_quantity) — a double division of identical operands in both
    engines, and MIN is order-insensitive, so results hash-match.

    Plan shape: the correlated MIN-subquery of the original is a
    per-part aggregate broadcast back into the pair-grain aggregate
    (never a per-row subquery); part/supplier/nation/region are
    broadcast dims pruned before the fact scan aggregation; the
    top-100 is TakeOrderedAndProject.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    europe_supp = (
        supp.join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(region.where(F.col("r_name") == "EUROPE")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    target_parts = part.where(F.col("p_size") == 15).select("p_partkey", "p_name")
    pairs = (
        li.join(target_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(europe_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    part_min = pairs.groupBy(F.col("p_partkey").alias("mp_key")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        pairs.join(
            part_min,
            (F.col("p_partkey") == F.col("mp_key")) & (F.col("unit_cost") == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )


Q2_ORACLE = """
WITH europe_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), pairs AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN europe_supp ON l_suppkey = s_suppkey
  WHERE p_size = 15
  GROUP BY p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
), part_min AS (
  SELECT p_partkey AS mp_key, MIN(unit_cost) AS min_cost FROM pairs GROUP BY p_partkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
FROM (
  SELECT pairs.*, row_number() OVER (
    ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC) AS rn
  FROM pairs JOIN part_min ON p_partkey = mp_key AND unit_cost = min_cost
) WHERE rn <= 100
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted: profit per supplier nation and order year
    for parts whose name contains 'bolt'.

    No partsupp → supply cost is approximated as p_retailprice ·
    l_quantity; profit = Σ(extprice·(1−disc) − retailprice·qty),
    decimal-exact.  The only wide shuffle is lineitem⋈orders; part,
    supplier, nation broadcast, with the name filter pruning part
    before broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    amount = (
        _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
        - _dec("p_retailprice") * _dec("l_quantity")
    ).cast(DEC)
    return (
        li.join(part.where(F.col("p_name").contains("bolt")), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year(F.col("o_orderdate").cast("date")).alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


Q9_ORACLE = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) AS INT) AS o_year,
       CAST(SUM(CAST({_VOL_SQL} - CAST(p_retailprice AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(18,6)) AS DECIMAL(18,6))) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%bolt%'
GROUP BY n_name, CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) AS INT)
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 adapted: top-20 customers by revenue lost to
    returned items (l_returnflag = 'R') for orders placed in
    1995-Q4, with the customer's nation.

    The returnflag and order-date predicates push to the two fact
    scans; customer and nation broadcast; top-20 is
    TakeOrderedAndProject (per-partition top-20 + driver merge).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    od = F.col("o_orderdate").cast("date")
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(
            orders.where((od >= F.lit("1995-10-01").cast("date")) & (od < F.lit("1996-01-01").cast("date"))),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(F.sum(_vol()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_ORACLE = f"""
WITH agg AS (
  SELECT c_custkey, c_name, c_acctbal, n_name, c_mktsegment,
         CAST(SUM({_VOL_SQL}) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND CAST(o_orderdate AS DATE) >= DATE '1995-10-01'
    AND CAST(o_orderdate AS DATE) <  DATE '1996-01-01'
  GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
)
SELECT c_custkey, c_name, c_acctbal, n_name, c_mktsegment, revenue
FROM (SELECT *, row_number() OVER (ORDER BY revenue DESC, c_custkey ASC) AS rn FROM agg)
WHERE rn <= 20
"""


def q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted: among lineitems shipped ≥ 90 days after the
    order date (the schema has no commit/receipt dates or shipmode),
    count critical- vs normal-priority orders per ship year.

    Pure conditional aggregation (CASE sums) over the fact join —
    one pass, no self-join; the lateness predicate is evaluated
    during the join, and the group-by key space is tiny (years).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sd = F.col("l_shipdate").cast("date")
    late = sd >= F.date_add(F.col("o_orderdate").cast("date"), 90)
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(late)
        .groupBy(F.year(sd).alias("ship_year"))
        .agg(
            F.sum(F.when(critical, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(critical, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


Q12_ORACLE = """
SELECT CAST(EXTRACT(YEAR FROM CAST(l_shipdate AS DATE)) AS INT) AS ship_year,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE CAST(l_shipdate AS DATE) >= CAST(o_orderdate AS DATE) + INTERVAL 90 DAY
GROUP BY CAST(EXTRACT(YEAR FROM CAST(l_shipdate AS DATE)) AS INT)
"""


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts,
    including customers with zero qualifying orders (left outer join
    preserved through the first aggregation), qualifying = priority
    not '4-NOT SPECIFIED'.

    Two-level aggregation: customer-grain count (shuffles on
    custkey), then a tiny count-of-counts regroup.  At scale the
    left join is customer ⟕ pre-filtered orders — both sides
    shuffle-partitioned on custkey, no broadcast of the fact.
    """
    cu = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    qualifying = orders.where(F.col("o_orderpriority") != "4-NOT SPECIFIED").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        cu.join(qualifying, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_ORACLE = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN (
    SELECT o_custkey, o_orderkey FROM orders WHERE o_orderpriority <> '4-NOT SPECIFIED'
  ) ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum revenue over 1996-Q1.

    The revenue view is a suppkey-grain aggregate; the scalar MAX is
    one single-row aggregate cross-joined (broadcast) back — the
    original's subquery, never re-evaluated per row.  Ties all
    surface, as in the spec.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    sd = F.col("l_shipdate").cast("date")
    revenue = (
        li.where((sd >= F.lit("1996-01-01").cast("date")) & (sd < F.lit("1996-04-01").cast("date")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_vol()).cast("double").alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, CAST(SUM({_VOL_SQL}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) <  DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted: number of distinct suppliers able to supply
    each (brand, type, size) combination — supply pairs derived from
    lineitem, excluding one brand, PROMO types, sizes outside a
    fixed IN-list, and "complaint" suppliers (negative account
    balance stands in for the comment scan).

    Shape: distinct pair projection (map-side partial distinct on
    the fact scan), broadcast part filter, left-anti join for the
    NOT IN subquery, then countDistinct per small key space.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    wanted = part.where(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    complaints = supp.where(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(wanted, F.col("l_partkey") == F.col("p_partkey"))
        .join(complaints, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size"))
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 adapted: average yearly revenue lost if small-lot
    orders (quantity < 20% of the part's average) for Brand#3 parts
    of size < 10 were no longer filled.

    The correlated per-part AVG is a part-grain aggregate joined
    back (broadcast — it is one row per filtered part).  The 20%
    threshold comparison is exact integer-valued-double math
    (5·qty·cnt < Σqty, quantities are integral), so both engines
    select the identical row set; the revenue sum is decimal-exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    target = part.where((F.col("p_brand") == "Brand#3") & (F.col("p_size") < 10)).select("p_partkey")
    fact = li.join(target, F.col("l_partkey") == F.col("p_partkey"))
    per_part = fact.groupBy(F.col("p_partkey").alias("ap_key")).agg(
        F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    small = fact.join(per_part, F.col("p_partkey") == F.col("ap_key")).where(
        F.col("l_quantity") * 5.0 * F.col("cnt") < F.col("sum_qty")
    )
    return small.agg(
        (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small_lots"),
    )


Q17_ORACLE = """
WITH target AS (
  SELECT p_partkey FROM part WHERE p_brand = 'Brand#3' AND p_size < 10
), fact AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN target ON l_partkey = p_partkey
), per_part AS (
  SELECT l_partkey AS ap_key, SUM(l_quantity) AS sum_qty, COUNT(*) AS cnt
  FROM fact GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0 AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_small_lots
FROM fact JOIN per_part ON l_partkey = ap_key
WHERE l_quantity * 5.0 * cnt < sum_qty
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue from three OR-ed brand/size/quantity
    branches — exercises disjunctive predicate evaluation inside a
    single broadcast-hash join (no union of three scans; the common
    join key is factored out of the disjunction).
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .where(branch)
        .agg(
            F.sum(_vol()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


Q19_ORACLE = f"""
SELECT CAST(SUM({_VOL_SQL}) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted: suppliers who dominated the 1996 supply of
    some 'small'-named part — shipped more than half of that part's
    total quantity (the availqty > ½·demand test of the original,
    derived from lineitem in place of partsupp).

    Semijoin chain: (part,supp)-grain quantity aggregate → part
    total (second aggregate over the first, no rescan of the fact)
    → share filter → supplier-grain count.  Quantities are integral
    doubles, so 2·qty > total is exact in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    small_parts = part.where(F.col("p_name").startswith("small")).select("p_partkey")
    sd = F.col("l_shipdate").cast("date")
    pair_qty = (
        li.where((sd >= F.lit("1996-01-01").cast("date")) & (sd < F.lit("1997-01-01").cast("date")))
        .join(small_parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    part_total = pair_qty.groupBy(F.col("p_partkey").alias("tp_key")).agg(
        F.sum("supp_qty").alias("total_qty")
    )
    dominated = (
        pair_qty.join(part_total, F.col("p_partkey") == F.col("tp_key"))
        .where(F.col("supp_qty") * 2.0 > F.col("total_qty"))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_parts_dominated"))
    )
    return (
        dominated.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"), "n_parts_dominated")
        .orderBy("s_suppkey")
    )


Q20_ORACLE = """
WITH pair_qty AS (
  SELECT p_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
    AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
  GROUP BY p_partkey, l_suppkey
), part_total AS (
  SELECT p_partkey AS tp_key, SUM(supp_qty) AS total_qty FROM pair_qty GROUP BY p_partkey
), dominated AS (
  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_parts_dominated
  FROM pair_qty JOIN part_total ON p_partkey = tp_key
  WHERE supp_qty * 2.0 > total_qty
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, n_name AS nation, n_parts_dominated
FROM dominated
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
ORDER BY s_suppkey
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted: parts whose quantity supplied by NATION_9's
    suppliers exceeds 1/1000 of that nation's total supplied quantity
    (partsupp's availqty·supplycost becomes lineitem-derived supplied
    quantity — the schema has no partsupp; reference
    rakam-presto/src/main/java/org/rakam/presto/analysis/
    PrestoQueryExecutor.java delegates exactly such HAVING-against-
    scalar-subquery shapes to Presto).

    The defining Q11 shape survives: a grouped aggregate filtered
    against a SCALAR aggregate of the same base — expressed as the
    single-row crossJoin(broadcast(...)) idiom, so the nation-
    filtered fact scan feeds both aggregates in one plan (ReuseExchange
    collapses the repeated subtree).  Quantities are integral doubles:
    ``q·1000 > total`` is exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    nat_supp = (
        supp.join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name") == "NATION_9")
        .select("s_suppkey")
    )
    fact = li.join(nat_supp, F.col("l_suppkey") == F.col("s_suppkey"))
    pq = fact.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("supplied_qty"),
        F.sum(_vol()).cast("double").alias("supplied_value"),
    )
    tot = pq.agg(F.sum("supplied_qty").alias("total_qty"))
    return (
        pq.crossJoin(broadcast(tot))
        .where(F.col("supplied_qty") * 1000.0 > F.col("total_qty"))
        .select(
            F.col("l_partkey").alias("p_partkey"), "supplied_qty", "supplied_value"
        )
        .orderBy(F.desc("supplied_qty"), F.asc("p_partkey"))
    )


Q11_ORACLE = f"""
WITH nat_supp AS (
  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_9'
), pq AS (
  SELECT l_partkey AS p_partkey, SUM(l_quantity) AS supplied_qty,
         CAST(SUM({_VOL_SQL}) AS DOUBLE) AS supplied_value
  FROM lineitem JOIN nat_supp ON l_suppkey = s_suppkey
  GROUP BY 1
), tot AS (SELECT SUM(supplied_qty) AS total_qty FROM pq)
SELECT p_partkey, supplied_qty, supplied_value
FROM pq, tot
WHERE supplied_qty * 1000.0 > total_qty
ORDER BY supplied_qty DESC, p_partkey ASC
"""


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with any order totalling > 250 units —
    the IN-(grouped-HAVING-subquery) shape, expressed as an
    order-grain aggregate semi-joined back onto orders/customer.

    The only wide shuffle is the order-grain quantity sum (partial-
    aggregated map-side); qualifying orderkeys are a tiny frame
    BROADCAST into the orders join — never a second fact shuffle.
    Quantities are integral doubles, so the > 250 cut is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250.0)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            _dec("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 250.0
)
SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS DOUBLE) AS o_totalprice, total_qty
FROM orders JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted: suppliers who were the SOLE late shipper on
    a multi-supplier order (lateness = shipped > 90 days after the
    order date; the schema has no commit/receipt dates).  The
    original's EXISTS(other supplier) / NOT EXISTS(other late
    supplier) pair collapses into ONE order-grain aggregate:
    n_suppliers ≥ 2 ∧ n_late_suppliers = 1 — same semantics, one
    shuffle instead of two correlated self-joins (the blame is
    unambiguous exactly when one supplier is late).

    Top-20 by wait count is a total order ending in the unique
    supplier key (TakeOrderedAndProject)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    fact = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    late = F.col("l_shipdate").cast("date") > F.date_add(
        F.col("o_orderdate").cast("date"), 90
    )
    # reduce to (order, supplier) grain FIRST: two countDistincts in
    # one aggregate planned an Expand (every fact row duplicated per
    # distinct path); this shape is two plain partial-aggregatable
    # groupBys with identical semantics
    pair = fact.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(late.cast("int")).alias("late_any")
    )
    per_order = pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("late_any").alias("n_late"),
        F.max(F.when(F.col("late_any") == 1, F.col("l_suppkey"))).alias(
            "late_supp"
        ),
    )
    blamed = per_order.where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    return (
        blamed.groupBy("late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(supp, F.col("late_supp") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
        .limit(20)
    )


Q21_ORACLE = """
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 90 DAY
                             THEN l_suppkey END) AS n_late,
         MAX(CASE WHEN CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 90 DAY
                  THEN l_suppkey END) AS late_supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_order JOIN supplier ON late_supp = s_suppkey
WHERE n_supp >= 2 AND n_late = 1
GROUP BY 1, 2
ORDER BY numwait DESC, s_suppkey ASC
LIMIT 20
"""


def top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N-per-group: the three priciest parts of every brand.

    Spark 3.5+ plans the rank-filter as WindowGroupLimit
    (Partial before the shuffle, Final after): each input partition
    keeps at most N rows per group BEFORE the exchange, so the
    shuffle carries ≤ N·groups·partitions rows instead of the whole
    table — the per-group analog of TakeOrderedAndProject.
    """
    part = load_table(spark, sf_dir, "part")
    from pyspark.sql import Window

    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rnk")
        .orderBy("p_brand", "rnk")
    )


TOP3_PER_BRAND_ORACLE = """
SELECT p_brand, p_partkey, p_name, p_retailprice, rnk
FROM (
  SELECT p_brand, p_partkey, p_name, p_retailprice,
         row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rnk
  FROM part
) WHERE rnk <= 3
"""


def order_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational backlog time series: for every order day, how many
    orders have been PLACED but not yet fully shipped (completion =
    the order's max lineitem shipdate; orders with no lineitems never
    complete).  The warehouse ops dashboard query — a running
    inventory balance.

    Plan: +1/−1 deltas at placement/completion days union into one
    day-grain aggregate, then a running sum over the DAY GRAIN — the
    window input is bounded by the calendar span (a few thousand rows
    at ANY corpus size; exempt in the plan-hygiene test on those
    grounds), never the fact table.  All counts are exact integers."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    placed = orders.select(
        F.col("o_orderdate").cast("date").alias("day"),
        F.lit(1).alias("placed"),
        F.lit(0).alias("completed"),
    )
    done = (
        li.groupBy("l_orderkey")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("day"))
        .select("day", F.lit(0).alias("placed"), F.lit(1).alias("completed"))
    )
    daily = (
        placed.unionByName(done)
        .groupBy("day")
        .agg(
            F.sum("placed").alias("n_placed"),
            F.sum("completed").alias("n_completed"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        daily.withColumn(
            "backlog", F.sum(F.col("n_placed") - F.col("n_completed")).over(w)
        )
        .select("day", "n_placed", "n_completed", "backlog")
        .orderBy("day")
    )


ORDER_BACKLOG_ORACLE = """
WITH placed AS (
  SELECT CAST(o_orderdate AS DATE) AS day, 1 AS placed, 0 AS completed FROM orders
), done AS (
  SELECT CAST(MAX(CAST(l_shipdate AS DATE)) AS DATE) AS day, 0 AS placed, 1 AS completed
  FROM lineitem GROUP BY l_orderkey
), daily AS (
  SELECT day, CAST(SUM(placed) AS BIGINT) AS n_placed,
         CAST(SUM(completed) AS BIGINT) AS n_completed
  FROM (SELECT * FROM placed UNION ALL SELECT * FROM done)
  GROUP BY day
)
SELECT day, n_placed, n_completed,
       CAST(SUM(n_placed - n_completed) OVER (
         ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS backlog
FROM daily ORDER BY day
"""


def revenue_pareto_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: the top-100 customers by lifetime order
    revenue with each customer's CUMULATIVE share of TOTAL revenue —
    the 80/20 dashboard.

    The running sum windows over exactly 100 rows (TakeOrdered first,
    window second — the vocab_coverage pattern, exempt in the plan-
    hygiene test), so no unbounded single-partition funnel exists at
    any scale.  Revenue sums are decimal-exact; each share is ONE
    double division of exact decimal values."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice")).alias("revenue")
    )
    total = per_cust.agg(F.sum("revenue").alias("total_revenue"))
    top = (
        per_cust.orderBy(F.desc("revenue"), F.asc("o_custkey")).limit(100)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("revenue"), F.asc("o_custkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.withColumn("cum_revenue", F.sum("revenue").over(w))
        .crossJoin(broadcast(total))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            F.col("revenue").cast("double").alias("revenue"),
            (F.col("cum_revenue").cast("double") / F.col("total_revenue").cast("double")).alias(
                "cum_share"
            ),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
    )


REVENUE_PARETO_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS revenue
  FROM orders GROUP BY 1
), total AS (SELECT SUM(revenue) AS total_revenue FROM per_cust),
top100 AS (
  SELECT * FROM (
    SELECT o_custkey, revenue,
           row_number() OVER (ORDER BY revenue DESC, o_custkey ASC) AS rn
    FROM per_cust
  ) WHERE rn <= 100
)
SELECT c_custkey, c_name, CAST(revenue AS DOUBLE) AS revenue,
       CAST(SUM(revenue) OVER (ORDER BY revenue DESC, o_custkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         / CAST(total_revenue AS DOUBLE) AS cum_share
FROM top100 JOIN customer ON o_custkey = c_custkey, total
ORDER BY revenue DESC, c_custkey ASC
"""


def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style referential-integrity audit over the star schema,
    one row of violation counts: orphan lineitems (no parent order),
    childless orders (no lineitems), idle customers (no orders), and
    orders whose stored total diverges >1% from the decimal-exact
    lineitem rollup.

    r16 plan (same values): the orphan / childless / mismatch checks
    all key on the SAME order⋈lineitem relationship, so lineitem
    reduces ONCE to an orderkey-grain (line count, decimal charge
    rollup) aggregate, full-outer-joins the order header, and one
    conditional aggregate reads off all three counts — replacing two
    anti-joins + an inner-join rollup that scanned lineitem twice and
    orders three times (guide §2.4); the idle-customer anti-join keys
    on custkey and stays its own branch.  The mismatch threshold is
    decimal-exact on both sides so the selected set is
    order-insensitive, as before.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    idle_cust = cu.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    charge = (
        _dec("l_extendedprice")
        * (F.lit(1).cast(DEC) - _dec("l_discount"))
        * (F.lit(1).cast(DEC) + _dec("l_tax"))
    ).cast(DEC)
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_n_lines"), F.sum(charge).alias("s")
    )
    rel = orders.select("o_orderkey", "o_totalprice").join(
        per_order, F.col("o_orderkey") == F.col("l_orderkey"), "full_outer"
    )
    mismatch = (
        F.col("o_orderkey").isNotNull()
        & F.col("l_orderkey").isNotNull()
        & (
            F.abs(_dec("o_totalprice") - F.col("s"))
            > (_dec("o_totalprice") * F.lit(0.01).cast(DEC)).cast(DEC)
        )
    )
    a134 = rel.agg(
        F.coalesce(
            F.sum(F.when(F.col("o_orderkey").isNull(), F.col("_n_lines"))), F.lit(0)
        ).alias("n_orphan_lineitems"),
        F.count(F.when(F.col("l_orderkey").isNull(), 1)).alias("n_childless_orders"),
        F.count(F.when(mismatch, 1)).alias("n_total_mismatch"),
    )
    a3 = idle_cust.agg(F.count(F.lit(1)).alias("n_idle_customers"))
    return a134.crossJoin(a3).select(
        "n_orphan_lineitems", "n_childless_orders", "n_idle_customers", "n_total_mismatch"
    )


DATA_QUALITY_ORACLE = """
SELECT
  CAST((SELECT COUNT(*) FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT) AS n_orphan_lineitems,
  CAST((SELECT COUNT(*) FROM orders
        WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)) AS BIGINT) AS n_childless_orders,
  CAST((SELECT COUNT(*) FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) AS BIGINT) AS n_idle_customers,
  CAST((SELECT COUNT(*) FROM (
    SELECT o_orderkey, o_totalprice,
           SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
               * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
               * (CAST(1 AS DECIMAL(18,6)) + CAST(l_tax AS DECIMAL(18,6))) AS DECIMAL(18,6))) AS s
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_totalprice
  ) WHERE ABS(CAST(o_totalprice AS DECIMAL(18,6)) - s)
        > CAST(CAST(o_totalprice AS DECIMAL(18,6)) * CAST(0.01 AS DECIMAL(18,6)) AS DECIMAL(18,6))) AS BIGINT)
    AS n_total_mismatch
"""


def rfm_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile-cut RFM over the ORDERS star (the companion to the
    mean-split events-table ``rfm_segments``): per-customer Recency (days since
    last order, anchored at the corpus max order date), Frequency
    (order count) and Monetary (lifetime spend) are each cut at their
    corpus quartiles, and customers roll up into (r, f, m) segment
    cells — the classic CRM marketing segmentation.

    Quartile CUTOFFS come from one tiny 3-value percentile
    aggregation; bucket assignment is then ROW-LOCAL comparison
    against the broadcast cutoffs — deliberately NOT an NTILE over a
    global window, which would funnel every customer through one
    partition.  The per-customer rollup shuffles once on custkey.
    The exact ``percentile`` buffers the per-customer metric vector
    in one aggregation buffer; at 100× the mergeable-sketch variant
    (the ``value_quantile_sketch`` KLL path) is the documented scale
    alternative for the cutoff step.

    Determinism: recency/frequency are exact ints; monetary
    aggregates in DECIMAL(18,6) then casts once to double;
    ``percentile`` ≡ DuckDB ``quantile_cont`` interpolation
    bit-for-bit; bucket labels are integer comparisons; segment
    metrics are exact sums and a single division each.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(_dec("o_totalprice")).alias("monetary_dec"),
    )
    anchor = orders.agg(F.max("o_orderdate").alias("anchor"))
    rfm = (
        per_cust.crossJoin(broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff(F.col("anchor"), F.col("last_order")).alias("recency_days"),
            "frequency",
            F.col("monetary_dec").cast("double").alias("monetary"),
        )
    )
    cuts = rfm.agg(
        F.expr("percentile(recency_days, array(0.25, 0.5, 0.75))").alias("rc"),
        F.expr("percentile(frequency, array(0.25, 0.5, 0.75))").alias("fc"),
        F.expr("percentile(monetary, array(0.25, 0.5, 0.75))").alias("mc"),
    )

    def _q(col, cut, asc):
        # quartile 1..4; for recency LOWER is better so ascending
        # comparison; frequency/monetary HIGHER is better.
        v = F.col(col).cast("double")
        if asc:
            return (
                F.lit(1)
                + (v > F.element_at(cut, 1)).cast("int")
                + (v > F.element_at(cut, 2)).cast("int")
                + (v > F.element_at(cut, 3)).cast("int")
            )
        return (
            F.lit(4)
            - (v > F.element_at(cut, 1)).cast("int")
            - (v > F.element_at(cut, 2)).cast("int")
            - (v > F.element_at(cut, 3)).cast("int")
        )

    tagged = rfm.crossJoin(broadcast(cuts)).select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        _q("recency_days", F.col("rc"), asc=True).alias("r_q"),
        _q("frequency", F.col("fc"), asc=False).alias("f_q"),
        _q("monetary", F.col("mc"), asc=False).alias("m_q"),
    )
    return (
        tagged.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("frequency").alias("total_orders"),
            F.round(F.sum(_dec("monetary")).cast("double"), 6).alias("total_monetary"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


RFM_QUARTILES_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey, MAX(o_orderdate) AS last_order,
         COUNT(*) AS frequency,
         SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS monetary_dec
  FROM orders GROUP BY 1
),
anchor AS (SELECT MAX(o_orderdate) AS anchor FROM orders),
rfm AS (
  SELECT o_custkey,
         date_diff('day', CAST(last_order AS DATE), CAST(anchor AS DATE)) AS recency_days,
         frequency, CAST(monetary_dec AS DOUBLE) AS monetary
  FROM per_cust, anchor
),
cuts AS (
  SELECT quantile_cont(CAST(recency_days AS DOUBLE), [0.25, 0.5, 0.75]) AS rc,
         quantile_cont(CAST(frequency AS DOUBLE), [0.25, 0.5, 0.75]) AS fc,
         quantile_cont(monetary, [0.25, 0.5, 0.75]) AS mc
  FROM rfm
),
tagged AS (
  SELECT o_custkey, recency_days, frequency, monetary,
         1 + CAST(recency_days > rc[1] AS INT) + CAST(recency_days > rc[2] AS INT)
           + CAST(recency_days > rc[3] AS INT) AS r_q,
         4 - CAST(frequency > fc[1] AS INT) - CAST(frequency > fc[2] AS INT)
           - CAST(frequency > fc[3] AS INT) AS f_q,
         4 - CAST(monetary > mc[1] AS INT) - CAST(monetary > mc[2] AS INT)
           - CAST(monetary > mc[3] AS INT) AS m_q
  FROM rfm, cuts
)
SELECT r_q, f_q, m_q,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(frequency) AS BIGINT) AS total_orders,
       round(CAST(SUM(CAST(monetary AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_monetary
FROM tagged GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def part_copurchase_pairs(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Market-basket part affinity: pairs of parts bought together in
    the same order, with co-occurrence count, support, and lift
    (N·c12 / (c1·c2)) — the product-recommendation staple.

    r16 plan (same values): ONE orderkey-grain collect_set aggregate
    replaces the former distinct + lineitem self-join — the per-order
    distinct part set IS the dedup, and the in-array i<j expansion is
    row-local (bounded by the order's line count, single digits
    squared), so the fact shuffles once on l_orderkey instead of a
    distinct exchange plus a two-sided join re-shuffle (guide §2.4);
    the same bounded-by-construction discipline as the dedup LSH
    bucket expansion.  Lift's numerator/denominator are exact BIGINT
    products; one final division is bit-exact on both engines.
    Top-k via a total order ending in the unique (p1, p2) key.
    """
    per_order = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    )
    nord = per_order.agg(F.count(F.lit(1)).alias("_n"))
    part_orders = per_order.select(
        F.explode("ps").alias("l_partkey")
    ).groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    pair_expr = F.expr(
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS p1, y AS p2))))"
    )
    pairs = (
        per_order.select(F.explode(pair_expr).alias("pp"))
        .select("pp.p1", "pp.p2")
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    c1 = part_orders.select(F.col("l_partkey").alias("p1"), F.col("c").alias("c1"))
    c2 = part_orders.select(F.col("l_partkey").alias("p2"), F.col("c").alias("c2"))
    # part-count frames are |parts|-sized: let AQE pick the strategy
    # rather than forcing a broadcast that a 100 TB part dimension
    # would not fit
    return (
        pairs.join(c1, "p1")
        .join(c2, "p2")
        .crossJoin(F.broadcast(nord))
        .select(
            "p1",
            "p2",
            "c12",
            (F.col("c12") * F.col("_n")).cast("double").alias("_num"),
            (F.col("c1") * F.col("c2")).cast("double").alias("_den"),
            "c1",
            "c2",
            F.col("_n"),
        )
        .select(
            "p1",
            "p2",
            "c12",
            "c1",
            "c2",
            (F.col("c12").cast("double") / F.col("_n").cast("double")).alias("support"),
            (F.col("_num") / F.col("_den")).alias("lift"),
        )
        .orderBy(F.desc("c12"), "p1", "p2")
        .limit(k)
    )


PART_COPURCHASE_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
po AS (SELECT l_partkey, COUNT(*) AS c FROM li GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT p1, p2, c12,
       CAST(c1.c AS BIGINT) AS c1, CAST(c2.c AS BIGINT) AS c2,
       CAST(c12 AS DOUBLE) / CAST(n.n_orders AS DOUBLE) AS support,
       CAST(c12 * n.n_orders AS DOUBLE) / CAST(c1.c * c2.c AS DOUBLE) AS lift
FROM pairs
JOIN po c1 ON pairs.p1 = c1.l_partkey
JOIN po c2 ON pairs.p2 = c2.l_partkey
CROSS JOIN n
ORDER BY c12 DESC, p1, p2 LIMIT 20
"""


def supplier_reliability_wilson(
    spark: SparkSession, sf_dir: str, min_lines: int = 20, k: int = 25
) -> DataFrame:
    """Worst suppliers by late-shipment rate, ranked by the WILSON
    score lower bound (z=1.96) instead of the raw rate — the
    small-sample-honest ranking (a 2/2 late supplier must not outrank
    a 480/500 one).  Lateness follows the repo convention: shipped
    ≥ 90 days after the order date (q12's predicate).

    One partial-aggregatable rollup on suppkey over the
    lineitem⋈orders fact join (the join is on orderkey — at 100 TB
    the same co-partitioned shuffle every fact-fact query here
    shares), then row-local Wilson arithmetic on the ≤|suppliers|
    aggregate.  The Wilson expression is a multi-op float chain →
    ``round(.., 9)`` on BOTH engines, and the ranking sorts the
    ROUNDED column with the unique suppkey tiebreak, so order is
    deterministic cross-engine.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    late = F.col("l_shipdate").cast("date") >= F.date_add(
        F.col("o_orderdate").cast("date"), 90
    )
    per_supp = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(late.cast("long")).alias("n_late"),
        )
        .where(F.col("n_lines") >= min_lines)
    )
    z = 1.96
    n = F.col("n_lines").cast("double")
    p = F.col("n_late").cast("double") / n
    wilson = (
        p
        + F.lit(z * z) / (2.0 * n)
        - F.lit(z) * F.sqrt((p * (1.0 - p) + F.lit(z * z) / (4.0 * n)) / n)
    ) / (1.0 + F.lit(z * z) / n)
    return (
        per_supp.select(
            F.col("l_suppkey").alias("suppkey"),
            "n_lines",
            "n_late",
            (F.col("n_late").cast("double") / n).alias("late_rate"),
            F.round(wilson, 9).alias("wilson_lower"),
        )
        .orderBy(F.desc("wilson_lower"), "suppkey")
        .limit(k)
    )


SUPPLIER_WILSON_ORACLE = """
WITH per_supp AS (
  SELECT l_suppkey AS suppkey, COUNT(*) AS n_lines,
         SUM(CASE WHEN CAST(l_shipdate AS DATE) >= CAST(o_orderdate AS DATE) + INTERVAL 90 DAY
             THEN 1 ELSE 0 END) AS n_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1 HAVING COUNT(*) >= 20
),
scored AS (
  SELECT suppkey, CAST(n_lines AS BIGINT) AS n_lines, CAST(n_late AS BIGINT) AS n_late,
         CAST(n_late AS DOUBLE) / CAST(n_lines AS DOUBLE) AS late_rate,
         round((
           CAST(n_late AS DOUBLE) / CAST(n_lines AS DOUBLE)
           + (1.96 * 1.96) / (2.0 * CAST(n_lines AS DOUBLE))
           - 1.96 * sqrt((CAST(n_late AS DOUBLE) / CAST(n_lines AS DOUBLE)
                          * (1.0 - CAST(n_late AS DOUBLE) / CAST(n_lines AS DOUBLE))
                          + (1.96 * 1.96) / (4.0 * CAST(n_lines AS DOUBLE)))
                         / CAST(n_lines AS DOUBLE))
         ) / (1.0 + (1.96 * 1.96) / CAST(n_lines AS DOUBLE)), 9) AS wilson_lower
  FROM per_supp
)
SELECT suppkey, n_lines, n_late, late_rate, wilson_lower
FROM scored ORDER BY wilson_lower DESC, suppkey LIMIT 25
"""


MIGRATION_SPLIT_DATE = "1998-05-01"  # midpoint of the order-date range


def customer_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-tier migration matrix: each customer gets an
    activity quartile (by order count) in period 1 and period 2
    (orders before/after the range midpoint), and the matrix counts
    every (tier_p1 → tier_p2) flow — including tier 0 = absent, so
    new and churned customers are first-class cells.  The lifecycle
    report behind "are our best customers downgrading?".

    Same scale discipline as ``rfm_quartiles``: per-period quartile
    CUTOFFS come from one tiny percentile aggregation; tier
    assignment is row-local against the broadcast cutoffs (no global
    NTILE window); the flow matrix is a ≤25-cell aggregation.  The
    full-outer join of the two period frames is on custkey — the
    dimension's own key.  Counts are exact; the share is a single
    division of exact integers.
    """
    orders = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    split = F.lit(MIGRATION_SPLIT_DATE).cast("date")

    def _period(df, name):
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias(f"n_{name}")
        )

    p1 = _period(orders.where(od < split), "p1")
    p2 = _period(orders.where(od >= split), "p2")
    c1 = p1.agg(F.expr("percentile(n_p1, array(0.25, 0.5, 0.75))").alias("c1"))
    c2 = p2.agg(F.expr("percentile(n_p2, array(0.25, 0.5, 0.75))").alias("c2"))

    def _tier(col, cut):
        v = F.col(col).cast("double")
        return (
            F.when(F.col(col).isNull(), F.lit(0))
            .otherwise(
                F.lit(1)
                + (v > F.element_at(cut, 1)).cast("int")
                + (v > F.element_at(cut, 2)).cast("int")
                + (v > F.element_at(cut, 3)).cast("int")
            )
        )

    joined = (
        p1.join(p2, "o_custkey", "full_outer")
        .crossJoin(broadcast(c1))
        .crossJoin(broadcast(c2))
        .select(
            "o_custkey",
            _tier("n_p1", F.col("c1")).alias("tier_p1"),
            _tier("n_p2", F.col("c2")).alias("tier_p2"),
        )
    )
    from pyspark.sql import Window

    cells = joined.groupBy("tier_p1", "tier_p2").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    # grand total from a window over the ≤25-cell aggregate — no
    # separate count() action, the join evaluates once
    w_all = Window.partitionBy()
    return (
        cells.select(
            "tier_p1",
            "tier_p2",
            "n_customers",
            (
                F.col("n_customers").cast("double")
                / F.sum("n_customers").over(w_all).cast("double")
            ).alias("share"),
        )
        .orderBy("tier_p1", "tier_p2")
    )


CUSTOMER_MIGRATION_ORACLE = f"""
WITH p1 AS (
  SELECT o_custkey, COUNT(*) AS n_p1 FROM orders
  WHERE CAST(o_orderdate AS DATE) < DATE '{MIGRATION_SPLIT_DATE}' GROUP BY 1
),
p2 AS (
  SELECT o_custkey, COUNT(*) AS n_p2 FROM orders
  WHERE CAST(o_orderdate AS DATE) >= DATE '{MIGRATION_SPLIT_DATE}' GROUP BY 1
),
c1 AS (SELECT quantile_cont(CAST(n_p1 AS DOUBLE), [0.25, 0.5, 0.75]) AS c FROM p1),
c2 AS (SELECT quantile_cont(CAST(n_p2 AS DOUBLE), [0.25, 0.5, 0.75]) AS c FROM p2),
joined AS (
  SELECT COALESCE(p1.o_custkey, p2.o_custkey) AS o_custkey,
         CASE WHEN n_p1 IS NULL THEN 0
              ELSE 1 + CAST(n_p1 > c1.c[1] AS INT) + CAST(n_p1 > c1.c[2] AS INT)
                     + CAST(n_p1 > c1.c[3] AS INT) END AS tier_p1,
         CASE WHEN n_p2 IS NULL THEN 0
              ELSE 1 + CAST(n_p2 > c2.c[1] AS INT) + CAST(n_p2 > c2.c[2] AS INT)
                     + CAST(n_p2 > c2.c[3] AS INT) END AS tier_p2
  FROM p1 FULL OUTER JOIN p2 USING (o_custkey), c1, c2
),
total AS (SELECT COUNT(*) AS t FROM joined)
SELECT tier_p1, tier_p2, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(COUNT(*) AS DOUBLE) / CAST(total.t AS DOUBLE) AS share
FROM joined, total GROUP BY tier_p1, tier_p2, total.t ORDER BY tier_p1, tier_p2
"""


def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation trade balance over the star: revenue EARNED by the
    nation's suppliers vs money SPENT by the nation's customers, and
    the balance — the macro view a TPC-H-style BI deployment serves
    (reference delegates such reports to the warehouse,
    rakam/README.md:27-31).

    Plan: TWO independent fact aggregations, never one mega-join —
    the supply side joins lineitem to the broadcast supplier dim and
    partial-aggregates per nationkey before the tiny nation join; the
    demand side is the q7-style lineitem⋈orders orderkey shuffle,
    then the custkey shuffle to customer, aggregated per nationkey at
    each step's grain.  A FULL outer join of the two 25-row nation
    aggregates closes it — a nation with suppliers but no customers
    still reports.

    Determinism: both sides aggregate DECIMAL(18,6) volumes (exact),
    cast to double once at the end; balance is one double subtraction
    of those exact decimal casts."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    supply = (
        li.join(supp.select("s_suppkey", "s_nationkey"), li.l_suppkey == supp.s_suppkey)
        .groupBy("s_nationkey")
        .agg(F.sum(_vol()).alias("supply_dec"))
        .select(F.col("s_nationkey").alias("nationkey"), "supply_dec")
    )
    demand = (
        li.select("l_orderkey", _vol().alias("vol"))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(F.sum("vol").alias("demand_dec"))
        .select(F.col("c_nationkey").alias("nationkey"), "demand_dec")
    )
    return (
        supply.join(demand, "nationkey", "full")
        .join(broadcast(nation), F.col("nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.coalesce(F.col("supply_dec"), F.lit(0).cast(DEC)).cast("double").alias("supply_revenue"),
            F.coalesce(F.col("demand_dec"), F.lit(0).cast(DEC)).cast("double").alias("purchase_spend"),
            (
                F.coalesce(F.col("supply_dec"), F.lit(0).cast(DEC)).cast("double")
                - F.coalesce(F.col("demand_dec"), F.lit(0).cast(DEC)).cast("double")
            ).alias("trade_balance"),
        )
        .orderBy("nation")
    )


NATION_TRADE_BALANCE_ORACLE = f"""
WITH supply AS (
  SELECT s_nationkey AS nationkey, SUM({_VOL_SQL}) AS supply_dec
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey GROUP BY 1
),
demand AS (
  SELECT c_nationkey AS nationkey, SUM({_VOL_SQL}) AS demand_dec
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  GROUP BY 1
)
SELECT n_name AS nation,
       CAST(COALESCE(supply_dec, 0) AS DOUBLE) AS supply_revenue,
       CAST(COALESCE(demand_dec, 0) AS DOUBLE) AS purchase_spend,
       CAST(COALESCE(supply_dec, 0) AS DOUBLE)
         - CAST(COALESCE(demand_dec, 0) AS DOUBLE) AS trade_balance
FROM supply FULL OUTER JOIN demand USING (nationkey)
JOIN nation ON nationkey = n_nationkey
ORDER BY nation
"""


def order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order cadence per market segment: the gap in days
    between a customer's consecutive orders, summarized per segment
    (median / p90 / mean gap, customers with a repeat order, total
    gaps) — the repeat-purchase-cycle report behind replenishment
    campaigns.

    Plan: ONE custkey-partitioned LAG window over orders ordered by
    (o_orderdate, o_orderkey) — the unique-key tiebreak makes
    same-day order pairs deterministic — then a custkey-shuffled join
    to the customer dim for the segment, and a 5-segment aggregate.
    The window partitions by customer (bounded by orders-per-
    customer), never a global funnel.

    Determinism: gaps are exact integer days; ``percentile`` ≡
    DuckDB ``quantile_cont`` interpolation bit-for-bit on integer
    inputs; the mean is an explicit exact-integer-sum / count double
    division rounded to 6."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.select("o_custkey", "o_orderdate", "o_orderkey")
        .withColumn("prev_date", F.lag("o_orderdate").over(w))
        .where(F.col("prev_date").isNotNull())
        .select(
            "o_custkey",
            F.datediff(F.col("o_orderdate"), F.col("prev_date")).alias("gap_days"),
        )
    )
    return (
        gaps.join(cust.select("c_custkey", "c_mktsegment"), gaps.o_custkey == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("repeat_customers"),
            F.count(F.lit(1)).alias("n_gaps"),
            F.expr("percentile(gap_days, 0.5)").alias("median_gap_days"),
            F.expr("percentile(gap_days, 0.9)").alias("p90_gap_days"),
            F.round(
                F.sum("gap_days").cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("mean_gap_days"),
        )
        .orderBy("c_mktsegment")
    )


ORDER_GAP_STATS_ORACLE = """
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day', LAG(o_orderdate) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), o_orderdate) AS gap_days
  FROM orders
  QUALIFY gap_days IS NOT NULL
)
SELECT c_mktsegment,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS repeat_customers,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       quantile_cont(gap_days, 0.5) AS median_gap_days,
       quantile_cont(gap_days, 0.9) AS p90_gap_days,
       round(CAST(SUM(gap_days) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_gap_days
FROM gaps JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY 1
"""


def running_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative monthly revenue per region with each month's
    running share of the region's total — the year-to-date pacing
    chart every revenue dashboard carries.

    Plan: revenue first collapses to the (region, month) grain —
    one orders⋈customer custkey shuffle, broadcast nation/region —
    and only THEN do the two windows run, over an aggregate of at
    most regions × months rows (5 × ~84 here; bounded by the date
    span at any corpus size, the documented exemption class for
    aggregate-grain windows).  Cumulative sum and region total are
    both region-partitioned windows.

    Determinism: monthly revenue sums DECIMAL(18,6); the running sum
    accumulates DECIMALS (exact, order-free) and casts to double per
    row; share is one double division rounded to 9."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    monthly = (
        orders.join(cust.select("c_custkey", "c_nationkey"), orders.o_custkey == F.col("c_custkey"))
        .join(broadcast(nation.select("n_nationkey", "n_regionkey")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("r_name").alias("region"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(F.sum(_dec("o_totalprice")).alias("rev_dec"))
    )
    wcum = Window.partitionBy("region").orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    wtot = Window.partitionBy("region")
    return (
        monthly.select(
            "region",
            "month",
            F.col("rev_dec").cast("double").alias("revenue"),
            F.sum("rev_dec").over(wcum).cast("double").alias("cum_revenue"),
            F.round(
                F.sum("rev_dec").over(wcum).cast("double")
                / F.sum("rev_dec").over(wtot).cast("double"),
                9,
            ).alias("cum_share"),
        )
        .orderBy("region", "month")
    )


RUNNING_REVENUE_SHARE_ORACLE = """
WITH monthly AS (
  SELECT r_name AS region, strftime(o_orderdate, '%Y-%m') AS month,
         SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
)
SELECT region, month,
       CAST(rev_dec AS DOUBLE) AS revenue,
       CAST(SUM(rev_dec) OVER (PARTITION BY region ORDER BY month
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_revenue,
       round(CAST(SUM(rev_dec) OVER (PARTITION BY region ORDER BY month
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(SUM(rev_dec) OVER (PARTITION BY region) AS DOUBLE), 9) AS cum_share
FROM monthly ORDER BY region, month
"""


def order_priority_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority mix drift per month: the χ² statistic of each
    month's priority distribution against the corpus-wide mix — the
    standard data-drift monitor (a month whose order-priority mix
    diverges flags an upstream intake change or a seasonality the
    SLA planning must absorb).

    Plan: ONE (month, priority) integer-count aggregate; the overall
    mix is a priorities-sized broadcast; χ² is row-local arithmetic
    summed over ≤ |priorities| cells per month.  No windows.

    Determinism: counts exact; expected = month_total × overall
    share and the χ² terms are written IDENTICALLY on both engines;
    the per-month sum over ≤5 cells → ``round(.., 6)``."""
    orders = load_table(spark, sf_dir, "orders")
    cell = (
        orders.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            "o_orderpriority",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    overall = cell.groupBy("o_orderpriority").agg(F.sum("n").alias("n_pri"))
    total = cell.agg(F.sum("n").alias("n_total"))
    month_tot = cell.groupBy("month").agg(F.sum("n").alias("n_month"))
    expected = (
        F.col("n_month").cast("double")
        * F.col("n_pri").cast("double")
        / F.col("n_total").cast("double")
    )
    chi_term = (F.col("n").cast("double") - expected) * (
        F.col("n").cast("double") - expected
    ) / expected
    return (
        cell.join(broadcast(overall), "o_orderpriority")
        .join(month_tot, "month")
        .crossJoin(broadcast(total))
        .groupBy("month")
        .agg(
            F.max("n_month").alias("n_orders"),
            F.round(F.sum(chi_term), 6).alias("chi_square"),
        )
        .orderBy("month")
    )


ORDER_PRIORITY_DRIFT_ORACLE = """
WITH cell AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderpriority, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
),
overall AS (SELECT o_orderpriority, SUM(n) AS n_pri FROM cell GROUP BY 1),
total AS (SELECT SUM(n) AS n_total FROM cell),
month_tot AS (SELECT month, SUM(n) AS n_month FROM cell GROUP BY 1)
SELECT month, CAST(MAX(n_month) AS BIGINT) AS n_orders,
       round(SUM(
         (CAST(n AS DOUBLE) - CAST(n_month AS DOUBLE) * CAST(n_pri AS DOUBLE) / CAST(n_total AS DOUBLE))
         * (CAST(n AS DOUBLE) - CAST(n_month AS DOUBLE) * CAST(n_pri AS DOUBLE) / CAST(n_total AS DOUBLE))
         / (CAST(n_month AS DOUBLE) * CAST(n_pri AS DOUBLE) / CAST(n_total AS DOUBLE))
       ), 6) AS chi_square
FROM cell JOIN overall USING (o_orderpriority) JOIN month_tot USING (month), total
GROUP BY month ORDER BY month
"""


def supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-concentration report per nation: the Herfindahl-
    Hirschman index of supplier revenue shares (Σ shareᵢ², 1/n ≤
    HHI ≤ 1) plus the top supplier's share — the procurement-risk
    metric behind single-source-dependency reviews (HHI > 0.25 is
    the antitrust rule-of-thumb for concentrated markets).

    Plan: one (nation, supplier) revenue rollup off the lineitem⋈
    supplier broadcast join (partial-aggregated map-side), then a
    25-row nation aggregate; HHI = Σ revᵢ² / (Σ revᵢ)² needs no
    per-supplier share materialization.  Top share via max/total.

    Determinism: revenue sums in DECIMAL (exact); revᵢ² accumulates
    as double per nation (order-dependent) → ``round(.., 9)`` both
    engines; top share is max/total of exact decimal casts."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    per_supp = (
        li.join(
            supp.select("s_suppkey", "s_nationkey"),
            li.l_suppkey == supp.s_suppkey,
        )
        .groupBy("s_nationkey", "s_suppkey")
        .agg(F.sum(_vol()).alias("rev_dec"))
        .select(
            "s_nationkey",
            F.col("rev_dec").cast("double").alias("rev"),
        )
    )
    return (
        per_supp.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(
                F.sum(F.col("rev") * F.col("rev"))
                / (F.sum("rev") * F.sum("rev")),
                9,
            ).alias("hhi"),
            F.round(F.max("rev") / F.sum("rev"), 9).alias("top_share"),
        )
        .join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"), "n_suppliers", "hhi", "top_share"
        )
        .orderBy("nation")
    )


SUPPLIER_HHI_ORACLE = f"""
WITH per_supp AS (
  SELECT s_nationkey, s_suppkey,
         CAST(SUM({_VOL_SQL}) AS DOUBLE) AS rev
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2
)
SELECT n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       round(SUM(rev * rev) / (SUM(rev) * SUM(rev)), 9) AS hhi,
       round(MAX(rev) / SUM(rev), 9) AS top_share
FROM per_supp JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1 ORDER BY 1
"""


def customer_order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of CONSECUTIVE months with at least one order, per
    customer, reported as a histogram (streak length → customer
    count) — the classic gaps-and-islands consistency report behind
    "active N months in a row" loyalty tiers.

    Plan: ONE custkey-grain ``collect_set(month_index)`` aggregate
    (map-side partial collapses each customer's orders to their
    distinct months before the shuffle — the set is bounded by the
    date span in months, never by order volume), then the longest
    consecutive run folds ROW-LOCALLY over the sorted month array
    with ``F.aggregate`` — no window, no sort, no islands self-grouping.
    The only other exchange is the ≤ span-row histogram.  The DuckDB
    oracle keeps the classic gaps-and-islands window formulation, so
    two independent algorithms must agree.

    Determinism: every value is an exact integer (month indexes,
    counts); the histogram orders by its unique streak-length key."""
    orders = load_table(spark, sf_dir, "orders")
    mi = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sort_array(F.collect_set(mi.alias("mi"))).alias("months")
    )
    zero = F.struct(
        F.lit(-2).cast("long").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )
    streak = F.aggregate(
        F.col("months"),
        zero,
        lambda acc, m: F.struct(
            m.alias("prev"),
            F.when(m == acc["prev"] + 1, acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(m == acc["prev"] + 1, acc["run"] + 1).otherwise(
                    F.lit(1).cast("long")
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return (
        per_cust.select(streak.alias("streak_months"))
        .groupBy("streak_months")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("streak_months")
    )


CUSTOMER_ORDER_STREAKS_ORACLE = """
WITH months AS (
  SELECT DISTINCT o_custkey, year(o_orderdate) * 12 + month(o_orderdate) AS mi
  FROM orders
),
islands AS (
  SELECT o_custkey,
         mi - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY mi) AS grp
  FROM months
),
per_cust AS (
  SELECT o_custkey, MAX(len) AS streak_months
  FROM (SELECT o_custkey, grp, COUNT(*) AS len FROM islands GROUP BY 1, 2)
  GROUP BY 1
)
SELECT CAST(streak_months AS BIGINT) AS streak_months,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM per_cust GROUP BY 1 ORDER BY 1
"""


def supplier_late_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier longest run of CONSECUTIVE late shipments
    (lateness = shipped > 90 days after the order date, the q21
    convention), top 25 — the systemic-delay screen that separates a
    supplier having a bad week from one with a one-off late order.

    Plan: one lineitem⋈orders orderkey shuffle attaches the order
    date; the islands trick needs two suppkey-partitioned
    row_number windows over (shipdate, orderkey, linenumber) — the
    composite unique tiebreak makes same-day rows deterministic —
    and both windows plus every downstream aggregate reuse the ONE
    suppkey exchange (subset-partitioning satisfies the
    (suppkey,late,grp) clusterings).  Late AND non-late runs group
    together so the per-supplier totals fall out of the same frame —
    the fact join is scanned exactly once, no totals re-join.
    Windows are bounded by lineitems-per-supplier; the top-25 is a
    total order ending in the unique supplier key
    (TakeOrderedAndProject).

    Determinism: run lengths and counts are exact integers."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    fact = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "l_suppkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_shipdate").cast("date")
            > F.date_add(F.col("o_orderdate").cast("date"), 90)
        ).alias("late"),
    )
    order_cols = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    w_all = Window.partitionBy("l_suppkey").orderBy(*order_cols)
    w_late = Window.partitionBy("l_suppkey", "late").orderBy(*order_cols)
    runs = (
        fact.withColumn("grp", F.row_number().over(w_all) - F.row_number().over(w_late))
        .groupBy("l_suppkey", "late", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    late_len = F.when(F.col("late"), F.col("run_len"))
    per_supp = runs.groupBy("l_suppkey").agg(
        F.max(late_len).alias("longest_late_run"),
        F.sum(F.coalesce(late_len, F.lit(0))).alias("n_late"),
        F.sum("run_len").alias("n_shipments"),
    )
    return (
        per_supp.where(F.col("longest_late_run").isNotNull())
        .select(
            F.col("l_suppkey").alias("suppkey"),
            "longest_late_run",
            "n_late",
            "n_shipments",
        )
        .orderBy(F.desc("longest_late_run"), F.desc("n_late"), F.asc("suppkey"))
        .limit(25)
    )


SUPPLIER_LATE_STREAKS_ORACLE = """
WITH fact AS (
  SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
         l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
grps AS (
  SELECT l_suppkey, late,
         ROW_NUMBER() OVER (PARTITION BY l_suppkey
                            ORDER BY l_shipdate, l_orderkey, l_linenumber)
         - ROW_NUMBER() OVER (PARTITION BY l_suppkey, late
                              ORDER BY l_shipdate, l_orderkey, l_linenumber) AS grp
  FROM fact
),
runs AS (
  SELECT l_suppkey, grp, COUNT(*) AS run_len
  FROM grps WHERE late GROUP BY 1, 2
),
per_supp AS (
  SELECT l_suppkey, MAX(run_len) AS longest_late_run, SUM(run_len) AS n_late
  FROM runs GROUP BY 1
),
totals AS (SELECT l_suppkey, COUNT(*) AS n_shipments FROM fact GROUP BY 1)
SELECT CAST(per_supp.l_suppkey AS BIGINT) AS suppkey,
       CAST(longest_late_run AS BIGINT) AS longest_late_run,
       CAST(n_late AS BIGINT) AS n_late,
       CAST(n_shipments AS BIGINT) AS n_shipments
FROM per_supp JOIN totals ON per_supp.l_suppkey = totals.l_suppkey
ORDER BY longest_late_run DESC, n_late DESC, suppkey ASC
LIMIT 25
"""


def discount_elasticity_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares slope of line revenue against discount level,
    per order priority — "how much net revenue do we buy per point
    of discount, and does the urgent-order segment respond
    differently?".  The closed-form b = (nΣxy − ΣxΣy)/(nΣxx − ΣxΣx)
    over x = discount in integer percent, y = discounted revenue.

    Plan: one lineitem⋈orders orderkey shuffle to attach the
    priority, then a single 5-row aggregate of six sums — the
    regression itself is constant work after the partial-aggregated
    shuffle; nothing is windowed and nothing funnels.

    Determinism: x is an exact integer, y aggregates in
    DECIMAL(18,6) widened to DECIMAL(38,6) for the Σxy product (the
    nΣxy cross terms reach ~1e17 at sf1 — past DECIMAL(18)'s range
    but exact at 38) — every sum is order-free exact; the single
    final division is a double rounded to 6 on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    wide = "decimal(38,6)"
    x = F.round(F.col("l_discount") * 100).cast("long")
    fact = li.join(
        orders.select("o_orderkey", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "o_orderpriority",
        x.alias("x"),
        _vol().alias("y"),
    )
    agg = fact.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("y").cast(wide)).alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum((F.col("x").cast(wide) * F.col("y")).cast(wide)).alias("sxy"),
    )
    num = (
        F.col("n").cast(wide) * F.col("sxy")
        - F.col("sx").cast(wide) * F.col("sy")
    ).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return agg.select(
        "o_orderpriority",
        "n",
        F.round(F.col("sy").cast("double"), 6).alias("revenue"),
        F.round(num / den, 6).alias("slope_per_discount_pct"),
    ).orderBy("o_orderpriority")


DISCOUNT_ELASTICITY_ORACLE = f"""
WITH fact AS (
  SELECT o_orderpriority,
         CAST(round(l_discount * 100) AS BIGINT) AS x,
         {_VOL_SQL} AS y
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
-- DuckDB caps decimal multiplies at combined width 38, so the
-- cross terms use the tightest widths that hold the sf<=0.1 oracle
-- scales exactly (Spark's side carries DECIMAL(38,6) throughout;
-- both are exact, so they agree).
agg AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(26,6))) AS DECIMAL(26,6)) AS sy,
         SUM(x * x) AS sxx,
         CAST(SUM(CAST(x AS DECIMAL(3,0)) * y) AS DECIMAL(26,6)) AS sxy
  FROM fact GROUP BY 1
)
SELECT o_orderpriority,
       n,
       round(CAST(sy AS DOUBLE), 6) AS revenue,
       round(CAST(CAST(n AS DECIMAL(12,0)) * sxy - CAST(sx AS DECIMAL(12,0)) * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_per_discount_pct
FROM agg ORDER BY o_orderpriority
"""


# log10(1 + 1/d) for d = 1..9, precomputed so BOTH engines consume
# the same literal doubles (cross-libm log10 could differ in the
# last ulp; a shared constant cannot).
_BENFORD_EXPECTED = [
    0.301029995664, 0.176091259056, 0.124938736608, 0.096910013008,
    0.079181246048, 0.066946789631, 0.057991946978, 0.051152522447,
    0.045757490561,
]


def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals against
    Benford's law — the standard synthetic-data / fraud screen (a
    fabricated price column shows a flat digit histogram; organic
    multiplicative totals track log10(1+1/d)).

    Plan: one project (integer cents → leading digit via the exact
    integer-to-string path, no float log10) and one 9-row hash
    aggregate; the grand total joins back as a broadcast of one row.

    Determinism: the leading digit comes from CAST(BIGINT AS
    STRING) — identical across engines, unlike floor(log10(x))
    whose last-ulp behavior at powers of ten is libm-dependent.
    Shares are a single exact division rounded to 9; the expected
    values are shared literals; deviation is one subtraction of
    identically-computed doubles."""
    orders = load_table(spark, sf_dir, "orders")
    expected = F.element_at(
        F.array(*[F.lit(v) for v in _BENFORD_EXPECTED]),
        F.col("digit").cast("int"),
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    digits = orders.select(
        F.substring(cents.cast("string"), 1, 1).cast("long").alias("digit")
    )
    total = digits.groupBy().agg(F.count(F.lit(1)).alias("total"))
    return (
        digits.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(broadcast(total))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("total"), 9).alias("share"),
            F.round(
                F.col("n") / F.col("total") - expected, 9
            ).alias("deviation"),
        )
        .orderBy("digit")
    )


_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {v!r}" for d, v in enumerate(_BENFORD_EXPECTED, start=1)
)

BENFORD_PRICE_ORACLE = f"""
WITH digits AS (
  SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
),
counts AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY 1
),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM digits)
SELECT digit, n,
       round(CAST(n AS DOUBLE) / total, 9) AS share,
       round(CAST(n AS DOUBLE) / total - (CASE digit {_BENFORD_CASE} END), 9) AS deviation
FROM counts, total
ORDER BY digit
"""


def order_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier estimate of time-to-NEXT-order (week grain): the
    survival-analysis view of repeat-purchase behavior, with proper
    RIGHT-CENSORING — a customer's span from their last order to the
    end of observation is "still waiting", not "never reordered",
    and ignoring it biases every naive gap average.  Emits, per
    week-since-order: the at-risk count, reorder events, censored
    spans, hazard d/n, and the KM survival Π(1 − d_u/n_u).

    Plan: ONE custkey-partitioned lead window builds the spans (the
    same events-shaped shuffle every sessionizer uses), then
    everything else runs at WEEK grain — the bucket aggregate is
    partial-aggregated, and the two unpartitioned windows (risk-set
    cumsum, survival cumsum-of-logs) see at most span/7 ≈ a few
    hundred rows at ANY corpus size (numeric bound asserted in
    test_plan_hygiene).

    Determinism: n/d/c are exact integers; hazard is one division
    rounded to 9; survival is exp∘Σln over identically-computed
    doubles rounded to 6 (round-both-sides float-chain convention —
    the exact-rational product overflows, and both engines sum the
    same ≤ span-length log series).

    Censoring horizon = max(o_orderdate) across ALL orders (a shared
    administrative end-of-study), so every span is well-defined."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    horizon = orders.groupBy().agg(F.max("o_orderdate").alias("end_date"))
    spans = (
        orders.select("o_custkey", "o_orderdate", "o_orderkey")
        .withColumn("nxt", F.lead("o_orderdate").over(w))
        .crossJoin(broadcast(horizon))
        .select(
            F.floor(
                F.datediff(
                    F.coalesce(F.col("nxt"), F.col("end_date")).cast("date"),
                    F.col("o_orderdate").cast("date"),
                )
                / 7
            ).alias("week"),
            F.col("nxt").isNotNull().cast("long").alias("ev"),
        )
    )
    buckets = spans.groupBy("week").agg(
        F.sum("ev").alias("d_events"),
        F.sum(F.lit(1) - F.col("ev")).alias("c_censored"),
    )
    total = spans.groupBy().agg(F.count(F.lit(1)).alias("total"))
    w_prior = Window.orderBy("week").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("week").rowsBetween(Window.unboundedPreceding, 0)
    at_risk = (
        buckets.crossJoin(broadcast(total))
        .withColumn(
            "n_at_risk",
            F.col("total")
            - F.coalesce(
                F.sum(F.col("d_events") + F.col("c_censored")).over(w_prior),
                F.lit(0),
            ),
        )
        .withColumn(
            "factor",
            F.lit(1.0)
            - F.col("d_events").cast("double") / F.col("n_at_risk").cast("double"),
        )
        .withColumn(
            # the terminal bucket can have d == n (everyone at risk
            # exits): ln(0) errors on DuckDB and nulls on Spark, so
            # the zero factor is flagged and pins survival to 0 from
            # that week on — the mathematically correct limit
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
        "week",
        "n_at_risk",
        "d_events",
        "c_censored",
        F.round(
            F.col("d_events").cast("double") / F.col("n_at_risk").cast("double"), 9
        ).alias("hazard"),
        F.round(F.col("survival"), 6).alias("km_survival"),
    ).orderBy("week")


ORDER_SURVIVAL_ORACLE = """
WITH horizon AS (SELECT MAX(o_orderdate) AS end_date FROM orders),
spans AS (
  SELECT CAST(floor(datediff('day', o_orderdate,
               COALESCE(LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey),
                        end_date)) / 7) AS BIGINT) AS week,
         CASE WHEN LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) IS NULL
              THEN 0 ELSE 1 END AS ev
  FROM orders, horizon
),
buckets AS (
  SELECT week,
         CAST(SUM(ev) AS BIGINT) AS d_events,
         CAST(SUM(1 - ev) AS BIGINT) AS c_censored
  FROM spans GROUP BY 1
),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM spans),
risk AS (
  SELECT week, d_events, c_censored,
         CAST(total - COALESCE(SUM(d_events + c_censored) OVER (
             ORDER BY week ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_at_risk
  FROM buckets, total
),
factors AS (
  SELECT *, 1.0 - CAST(d_events AS DOUBLE) / n_at_risk AS factor FROM risk
)
SELECT week, n_at_risk, d_events, c_censored,
       round(CAST(d_events AS DOUBLE) / n_at_risk, 9) AS hazard,
       round(CASE WHEN MAX(CASE WHEN factor <= 0 THEN 1 ELSE 0 END) OVER (
                    ORDER BY week ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
                  THEN 0.0
                  ELSE exp(SUM(CASE WHEN factor > 0 THEN ln(factor) END) OVER (
                       ORDER BY week ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             END, 6) AS km_survival
FROM factors ORDER BY week
"""


def part_price_index_quarterly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-value price index (Drobisch) of the parts basket by
    quarter: average realized price per unit of the MATCHED basket
    (parts traded in both the base quarter and quarter t), relative
    to the same basket's base-quarter unit value —
    I_t = (Σ mass_t / Σ qty_t) ÷ (Σ mass_0 / Σ qty_0), matched on
    part.  The matched-sample unit-value index national statistics
    offices compute from transaction data when item-level fixed
    baskets (Laspeyres) would need a per-item price division — this
    formulation needs only FOUR exact sums per quarter, so it stays
    bit-deterministic where a per-part p̄_t = mass/qty division
    would hit engine-specific decimal-division scale rules.

    Plan: ONE (part, quarter) grain aggregate off the lineitem scan
    (partial-aggregated), joined to a base-quarter per-part aggregate
    DERIVED DIRECTLY FROM THE FACT SCAN (filtered by the broadcast
    1-row min-quarter, itself computed from min(raw shipdate) —
    quarter is monotone in date, so the string is built once on one
    row, not per row) — the cell aggregate is consumed exactly ONCE
    (round-11 re-plan: the old shape derived base_q AND the base
    slice from `cell`, re-running the full (part, quarter)
    aggregation three times — at sf0.1 each re-run is ~0.1 s so the
    local wall stays AQE-floor-bound either way, but at 100 TB the
    cell aggregate IS the dominant cost and tripling it is the
    difference).  The base side is part-dim-sized; AQE picks
    broadcast.  No windows, no fact self-join.

    Determinism: extendedprice is the per-line TOTAL so Σ mass and
    Σ qty are exact DECIMAL sums; the index is one double expression
    (a·d)/(b·c) of four exact decimals, rounded to 9 on both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    qtr = F.concat(
        F.year("l_shipdate").cast("string"),
        F.lit("-Q"),
        ((F.month("l_shipdate") + 2) / 3).cast("int").cast("string"),
    )
    cell = li.groupBy(F.col("l_partkey").alias("partkey"), qtr.alias("quarter")).agg(
        F.sum(_dec("l_extendedprice")).alias("mass"),  # Σ price·qty (exact)
        F.sum(_dec("l_quantity")).alias("qty"),
    )
    # the base quarter from a column-pruned scan of l_shipdate alone
    # (NOT a re-aggregation of cell — cell must be consumed once);
    # min over the RAW date (quarter is monotone in date), the string
    # built once on the 1-row result instead of per row
    min_ship = li.agg(F.min("l_shipdate").alias("_min_ship"))
    base_q = min_ship.select(
        F.concat(
            F.year("_min_ship").cast("string"),
            F.lit("-Q"),
            ((F.month("_min_ship") + 2) / 3).cast("int").cast("string"),
        ).alias("base_quarter")
    )
    base = (
        li.crossJoin(broadcast(base_q))
        .where(qtr == F.col("base_quarter"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(_dec("l_extendedprice")).alias("base_mass"),
            F.sum(_dec("l_quantity")).alias("base_qty"),
        )
    )
    agg = (
        cell.join(base, "partkey")  # inner join = matched basket only
        .groupBy("quarter")
        .agg(
            F.sum("mass").alias("mass_now"),
            F.sum("qty").alias("qty_now"),
            F.sum("base_mass").alias("mass_base"),
            F.sum("base_qty").alias("qty_base"),
            F.count(F.lit(1)).alias("n_parts"),
        )
    )
    idx = (
        F.col("mass_now").cast("double") * F.col("qty_base").cast("double")
    ) / (F.col("qty_now").cast("double") * F.col("mass_base").cast("double"))
    return agg.select(
        "quarter",
        "n_parts",
        F.round(F.col("mass_now").cast("double"), 6).alias("matched_mass"),
        F.round(idx, 9).alias("unit_value_index"),
    ).orderBy("quarter")


PART_PRICE_INDEX_ORACLE = """
WITH cell AS (
  SELECT l_partkey AS partkey,
         year(l_shipdate) || '-Q' || CAST((month(l_shipdate) + 2) // 3 AS VARCHAR)
           AS quarter,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS mass,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS qty
  FROM lineitem GROUP BY 1, 2
),
base_q AS (SELECT MIN(quarter) AS base_quarter FROM cell),
base AS (
  SELECT partkey, mass AS base_mass, qty AS base_qty
  FROM cell, base_q WHERE quarter = base_quarter
),
agg AS (
  SELECT c.quarter,
         CAST(SUM(c.mass) AS DECIMAL(26,6)) AS mass_now,
         CAST(SUM(c.qty) AS DECIMAL(26,6)) AS qty_now,
         CAST(SUM(b.base_mass) AS DECIMAL(26,6)) AS mass_base,
         CAST(SUM(b.base_qty) AS DECIMAL(26,6)) AS qty_base,
         CAST(COUNT(*) AS BIGINT) AS n_parts
  FROM cell c JOIN base b USING (partkey)
  GROUP BY 1
)
SELECT quarter, n_parts,
       round(CAST(mass_now AS DOUBLE), 6) AS matched_mass,
       round((CAST(mass_now AS DOUBLE) * CAST(qty_base AS DOUBLE))
             / (CAST(qty_now AS DOUBLE) * CAST(mass_base AS DOUBLE)), 9)
         AS unit_value_index
FROM agg ORDER BY quarter
"""


def orders_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal index by calendar month (1–12): each month-of-year's
    share of orders and revenue expressed relative to a uniform
    month — index 1.0 = exactly average, 1.2 = 20% over — the
    classical multiplicative-decomposition seasonal factor retailers
    use for inventory and staffing curves.

    Plan: one 12-row hash aggregate over the orders scan (month-of-
    year is row-local), the grand totals broadcast back as a single
    row — two scans collapsed into one via window-free sums of the
    12-row aggregate itself (a second tiny aggregate, not a second
    table scan).

    Determinism: counts and decimal revenue sums are exact; each
    index is one double expression of exact values rounded to 9."""
    orders = load_table(spark, sf_dir, "orders")
    cell = orders.groupBy(F.month("o_orderdate").alias("month_of_year")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).alias("revenue"),
    )
    totals = cell.groupBy().agg(
        F.sum("n_orders").alias("t_orders"),
        F.sum("revenue").alias("t_revenue"),
    )
    return (
        cell.crossJoin(broadcast(totals))
        .select(
            "month_of_year",
            "n_orders",
            F.round(F.col("revenue").cast("double"), 6).alias("revenue"),
            F.round(
                F.lit(12.0)
                * F.col("n_orders").cast("double")
                / F.col("t_orders").cast("double"),
                9,
            ).alias("order_seasonal_index"),
            F.round(
                F.lit(12.0)
                * F.col("revenue").cast("double")
                / F.col("t_revenue").cast("double"),
                9,
            ).alias("revenue_seasonal_index"),
        )
        .orderBy("month_of_year")
    )


ORDERS_SEASONALITY_ORACLE = """
WITH cell AS (
  SELECT month(o_orderdate) AS month_of_year,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(26,6)) AS revenue
  FROM orders GROUP BY 1
),
totals AS (
  SELECT CAST(SUM(n_orders) AS BIGINT) AS t_orders,
         CAST(SUM(revenue) AS DECIMAL(26,6)) AS t_revenue
  FROM cell
)
SELECT month_of_year, n_orders,
       round(CAST(revenue AS DOUBLE), 6) AS revenue,
       round(12.0 * n_orders / t_orders, 9) AS order_seasonal_index,
       round(12.0 * CAST(revenue AS DOUBLE) / CAST(t_revenue AS DOUBLE), 9)
         AS revenue_seasonal_index
FROM cell, totals ORDER BY month_of_year
"""


QUERIES = {
    "orders_seasonality_index": orders_seasonality_index,
    "order_survival_curve": order_survival_curve,
    "part_price_index_quarterly": part_price_index_quarterly,
    "customer_order_streaks": customer_order_streaks,
    "supplier_late_streaks": supplier_late_streaks,
    "discount_elasticity_by_priority": discount_elasticity_by_priority,
    "benford_price_audit": benford_price_audit,
    "order_priority_drift": order_priority_drift,
    "supplier_hhi": supplier_hhi,
    "nation_trade_balance": nation_trade_balance,
    "order_gap_stats": order_gap_stats,
    "running_revenue_share": running_revenue_share,
    "customer_migration_matrix": customer_migration_matrix,
    "supplier_reliability_wilson": supplier_reliability_wilson,
    "rfm_quartiles": rfm_quartiles,
    "part_copurchase_pairs": part_copurchase_pairs,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q9_product_profit": q9_product_profit,
    "q10_returned_items": q10_returned_items,
    "q11_important_stock": q11_important_stock,
    "q12_late_priority": q12_late_priority,
    "q13_order_distribution": q13_order_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q16_part_supplier_counts": q16_part_supplier_counts,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q20_dominant_supplier": q20_dominant_supplier,
    "q21_suppliers_kept_waiting": q21_suppliers_kept_waiting,
    "order_backlog_daily": order_backlog_daily,
    "revenue_pareto_top100": revenue_pareto_top100,
    "data_quality_audit": data_quality_audit,
    "top3_parts_per_brand": top3_parts_per_brand,
}

ORACLES = {
    "orders_seasonality_index": ORDERS_SEASONALITY_ORACLE,
    "order_survival_curve": ORDER_SURVIVAL_ORACLE,
    "part_price_index_quarterly": PART_PRICE_INDEX_ORACLE,
    "customer_order_streaks": CUSTOMER_ORDER_STREAKS_ORACLE,
    "supplier_late_streaks": SUPPLIER_LATE_STREAKS_ORACLE,
    "discount_elasticity_by_priority": DISCOUNT_ELASTICITY_ORACLE,
    "benford_price_audit": BENFORD_PRICE_ORACLE,
    "order_priority_drift": ORDER_PRIORITY_DRIFT_ORACLE,
    "supplier_hhi": SUPPLIER_HHI_ORACLE,
    "nation_trade_balance": NATION_TRADE_BALANCE_ORACLE,
    "order_gap_stats": ORDER_GAP_STATS_ORACLE,
    "running_revenue_share": RUNNING_REVENUE_SHARE_ORACLE,
    "customer_migration_matrix": CUSTOMER_MIGRATION_ORACLE,
    "supplier_reliability_wilson": SUPPLIER_WILSON_ORACLE,
    "rfm_quartiles": RFM_QUARTILES_ORACLE,
    "part_copurchase_pairs": PART_COPURCHASE_ORACLE,
    "q2_min_cost_supplier": Q2_ORACLE,
    "q9_product_profit": Q9_ORACLE,
    "q10_returned_items": Q10_ORACLE,
    "q11_important_stock": Q11_ORACLE,
    "q12_late_priority": Q12_ORACLE,
    "q13_order_distribution": Q13_ORACLE,
    "q15_top_supplier": Q15_ORACLE,
    "q16_part_supplier_counts": Q16_ORACLE,
    "q17_small_qty_revenue": Q17_ORACLE,
    "q18_large_volume_customers": Q18_ORACLE,
    "q19_disjunctive_revenue": Q19_ORACLE,
    "q20_dominant_supplier": Q20_ORACLE,
    "q21_suppliers_kept_waiting": Q21_ORACLE,
    "order_backlog_daily": ORDER_BACKLOG_ORACLE,
    "revenue_pareto_top100": REVENUE_PARETO_ORACLE,
    "data_quality_audit": DATA_QUALITY_ORACLE,
    "top3_parts_per_brand": TOP3_PER_BRAND_ORACLE,
}
