"""Round-13 relational additions: order-line position effects, part
naming-term price premiums, and fiscal-quarter-end revenue loading —
warehouse-SQL report shapes the reference serves through its ad-hoc
query service (reference README.md:17,27-31; SURVEY.md §2.7),
expressed as declarative DataFrame plans.

Determinism conventions match relational.py: money through
DECIMAL(18,6); every ratio one double division of exact operands,
rounded to 9dp; every ordering ends in a unique key; date math is
exact integer day arithmetic.

Scale notes: all three reduce the fact table with ONE aggregate to
an enum-or-small-keyed cell table (line position ≤ 7 rows, name
terms ≈ vocabulary of p_name, quarters ≈ dates/90); shares use the
``mix_weights`` idiom (cell aggregate + broadcast-back total), never
a global window over fact rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from .relational import DEC, _dec
from .relational2 import _VOL_SQL, _vol


def value_by_line_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-line position effects: per ``l_linenumber`` (the 1st,
    2nd, … line of an order), line count, average quantity and
    revenue share — "do later lines in an order carry less value?",
    the relational analog of ``value_by_event_ordinal``.

    Plan: one lineitem aggregate to ≤7 position rows; shares
    broadcast the total back.  Quantity/revenue through DECIMAL."""
    li = load_table(spark, sf_dir, "lineitem")
    cell = li.groupBy("l_linenumber").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(_dec("l_quantity")).alias("_qty"),
        F.sum(_vol()).alias("_rev"),
    )
    tot = cell.agg(F.sum("_rev").alias("_t"))
    return (
        cell.crossJoin(F.broadcast(tot))
        .select(
            F.col("l_linenumber").cast("int").alias("line_position"),
            "n_lines",
            F.round(
                F.col("_qty").cast("double") / F.col("n_lines").cast("double"),
                9,
            ).alias("avg_quantity"),
            F.col("_rev").cast("double").alias("revenue"),
            F.round(
                F.col("_rev").cast("double") / F.col("_t").cast("double"), 9
            ).alias("share_of_revenue"),
        )
        .orderBy("line_position")
    )


VALUE_BY_LINE_POSITION_ORACLE = f"""
WITH cell AS (
  SELECT l_linenumber, COUNT(*) AS n_lines,
         SUM(CAST(l_quantity AS DECIMAL(18,6))) AS _qty,
         SUM({_VOL_SQL}) AS _rev
  FROM lineitem GROUP BY 1
)
SELECT CAST(l_linenumber AS INT) AS line_position,
       CAST(n_lines AS BIGINT) AS n_lines,
       round(CAST(_qty AS DOUBLE) / CAST(n_lines AS DOUBLE), 9)
         AS avg_quantity,
       CAST(_rev AS DOUBLE) AS revenue,
       round(CAST(_rev AS DOUBLE)
             / CAST((SELECT SUM(_rev) FROM cell) AS DOUBLE), 9)
         AS share_of_revenue
FROM cell ORDER BY line_position
"""


def part_name_term_premium(
    spark: SparkSession, sf_dir: str, top_k: int = 30
) -> DataFrame:
    """Naming-term price premium: tokenize ``p_name``, and for the
    ``top_k`` most common terms report part count, average retail
    price, and the premium over the catalog-wide average — "which
    descriptive words travel with expensive parts?" (merchandising's
    first text-meets-price cut).

    Plan: one explode+aggregate over part (dimension-sized), a
    deterministic top-k (count desc, term asc), the global average
    broadcast back as a 1-row cross join.  Price sums DECIMAL; the
    premium is one double division rounded 9dp."""
    part = load_table(spark, sf_dir, "part")
    terms = part.select(
        F.explode(F.split(F.col("p_name"), " ")).alias("term"),
        "p_retailprice",
    )
    cell = terms.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(_dec("p_retailprice")).alias("_price"),
    )
    glob = part.agg(
        (
            F.sum(_dec("p_retailprice")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("_gavg")
    )
    avg_price = F.col("_price").cast("double") / F.col("n_parts").cast("double")
    return (
        cell.orderBy(F.col("n_parts").desc(), "term")
        .limit(top_k)
        .crossJoin(F.broadcast(glob))
        .select(
            "term",
            "n_parts",
            F.round(avg_price, 9).alias("avg_price"),
            F.round(avg_price / F.col("_gavg"), 9).alias("premium"),
        )
        .orderBy(F.col("n_parts").desc(), "term")
    )


PART_NAME_TERM_PREMIUM_ORACLE = """
WITH terms AS (
  SELECT unnest(string_split(p_name, ' ')) AS term, p_retailprice
  FROM part
),
cell AS (
  SELECT term, COUNT(*) AS n_parts,
         SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS _price
  FROM terms GROUP BY 1
  ORDER BY n_parts DESC, term LIMIT 30
),
g AS (
  SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS _gavg
  FROM part
)
SELECT term, CAST(n_parts AS BIGINT) AS n_parts,
       round(CAST(_price AS DOUBLE) / CAST(n_parts AS DOUBLE), 9)
         AS avg_price,
       round((CAST(_price AS DOUBLE) / CAST(n_parts AS DOUBLE)) / _gavg, 9)
         AS premium
FROM cell, g
ORDER BY n_parts DESC, term
"""


def quarter_end_loading(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fiscal-quarter-end loading audit: per quarter, the share of
    order value booked in the LAST 7 days of the quarter vs the
    uniform-booking expectation (7 / days-in-quarter) — a loading
    index ≫ 1 is the classic end-of-quarter sales-push signature
    auditors screen for.

    Plan: orders aggregate to (quarter, is-last-7-days) cells via
    exact integer date arithmetic (last day of quarter = next
    quarter start − 1), then an enum-sized pivot; the index is one
    double division chain rounded 9dp."""
    o = load_table(spark, sf_dir, "orders")
    q = F.date_trunc("quarter", F.col("o_orderdate")).cast("date")
    qend = F.date_sub(F.add_months(q, 3), 1)
    in_tail = F.datediff(qend, F.col("o_orderdate")) < 7
    qdays = F.datediff(F.add_months(q, 3), q)
    cell = (
        o.select(
            q.alias("quarter"),
            qdays.alias("q_days"),
            in_tail.cast("int").alias("tail"),
            _dec("o_totalprice").alias("_v"),
        )
        .groupBy("quarter", "q_days")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("_v").alias("_tot"),
            F.sum(F.when(F.col("tail") == 1, F.col("_v")).otherwise(
                F.lit(0).cast(DEC)
            )).alias("_tail"),
        )
    )
    tail_share = F.col("_tail").cast("double") / F.col("_tot").cast("double")
    expected = F.lit(7.0) / F.col("q_days").cast("double")
    return cell.select(
        "quarter",
        "n_orders",
        F.round(tail_share, 9).alias("last7d_value_share"),
        F.round(tail_share / expected, 9).alias("loading_index"),
    ).orderBy("quarter")


QUARTER_END_LOADING_ORACLE = """
WITH base AS (
  SELECT date_trunc('quarter', o_orderdate) AS quarter,
         datediff('day', date_trunc('quarter', o_orderdate),
                  date_trunc('quarter', o_orderdate) + INTERVAL 3 MONTH)
           AS q_days,
         CASE WHEN datediff('day', o_orderdate,
                            date_trunc('quarter', o_orderdate)
                            + INTERVAL 3 MONTH - INTERVAL 1 DAY) < 7
              THEN 1 ELSE 0 END AS tail,
         CAST(o_totalprice AS DECIMAL(18,6)) AS _v
  FROM orders
),
cell AS (
  SELECT quarter, q_days, COUNT(*) AS n_orders,
         SUM(_v) AS _tot,
         SUM(CASE WHEN tail = 1 THEN _v
                  ELSE CAST(0 AS DECIMAL(18,6)) END) AS _tail
  FROM base GROUP BY 1, 2
)
SELECT CAST(quarter AS DATE) AS quarter,
       CAST(n_orders AS BIGINT) AS n_orders,
       round(CAST(_tail AS DOUBLE) / CAST(_tot AS DOUBLE), 9)
         AS last7d_value_share,
       round((CAST(_tail AS DOUBLE) / CAST(_tot AS DOUBLE))
             / (7.0 / CAST(q_days AS DOUBLE)), 9) AS loading_index
FROM cell ORDER BY quarter
"""


def reactivated_order_value_gap(
    spark: SparkSession, sf_dir: str, dormancy_days: int = 180
) -> DataFrame:
    """Reactivation economics: per market segment, orders placed
    after a >``dormancy_days`` silence compared with regular repeat
    orders on count and average value — "is a won-back customer a
    bigger basket?", the direct value read on win-back campaigns
    (first orders are excluded: they have no preceding gap).

    Plan: one customer-partitioned lag over ORDER-grain rows (not
    lineitem), integer day gaps, then an enum-sized (segment × class)
    aggregate; value through DECIMAL, the gap ratio one double
    division rounded 9dp."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        _dec("o_totalprice").alias("_v"),
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    ).where(F.col("gap_days").isNotNull())
    j = seq.join(
        c.select("c_custkey", "c_mktsegment"),
        seq["o_custkey"] == c["c_custkey"],
    )
    cls = (F.col("gap_days") > dormancy_days).cast("int")
    cell = j.groupBy(
        F.col("c_mktsegment").alias("segment"),
        cls.alias("is_reactivation"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("_v").alias("_tot"),
    )
    return cell.select(
        "segment",
        "is_reactivation",
        "n_orders",
        F.round(
            F.col("_tot").cast("double") / F.col("n_orders").cast("double"),
            9,
        ).alias("avg_order_value"),
    ).orderBy("segment", "is_reactivation")


REACTIVATED_ORDER_VALUE_ORACLE = """
WITH seq AS (
  SELECT o_custkey, o_orderdate, o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,6)) AS _v,
         datediff('day',
                  lag(o_orderdate) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey),
                  o_orderdate) AS gap_days
  FROM orders
),
j AS (
  SELECT c.c_mktsegment AS segment,
         CASE WHEN s.gap_days > 180 THEN 1 ELSE 0 END AS is_reactivation,
         s._v
  FROM seq s JOIN customer c ON s.o_custkey = c.c_custkey
  WHERE s.gap_days IS NOT NULL
)
SELECT segment, CAST(is_reactivation AS INT) AS is_reactivation,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       round(CAST(SUM(_v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
         AS avg_order_value
FROM j GROUP BY 1, 2 ORDER BY 1, 2
"""


def supplier_portfolio_diversity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Supplier portfolio diversity per nation: how many distinct
    part types each supplier ships and how evenly its revenue
    spreads across them (revenue entropy in nats), rolled up to
    nation means — the supply-base-resilience view next to
    ``supplier_hhi``'s market-concentration index (a nation whose
    suppliers are all single-type is fragile even at low HHI).

    Determinism: entropy terms follow the rounded-term DECIMAL
    contract per (supplier, type) revenue share; nation means divide
    exact DECIMAL sums by exact counts.

    Plan: one lineitem aggregate to (supplier, type) cells (part dim
    broadcast), supplier-grain entropy over those cells, nation
    rollup with the supplier dim broadcast — never a window over
    fact rows."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cell = (
        li.join(
            part.select("p_partkey", "p_type"),
            li["l_partkey"] == part["p_partkey"],
        )
        .groupBy("l_suppkey", "p_type")
        .agg(F.sum(_vol()).alias("_rev"))
    )
    stot = cell.groupBy("l_suppkey").agg(
        F.sum("_rev").alias("_st"), F.count(F.lit(1)).alias("n_types")
    )
    p = F.col("_rev").cast("double") / F.col("_st").cast("double")
    term = F.round(-(p * F.log(p)), 9).cast("decimal(18,9)")
    per_supp = (
        cell.join(stot, "l_suppkey")
        .groupBy("l_suppkey", "n_types")
        .agg(F.sum(term).alias("_h"))
    )
    j = per_supp.join(
        supp.select("s_suppkey", "s_nationkey"),
        per_supp["l_suppkey"] == supp["s_suppkey"],
    ).join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(
                F.sum("n_types").cast("double")
                / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("mean_types_supplied"),
            F.round(
                F.sum("_h").cast("double") / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("mean_type_entropy_nats"),
        )
        .orderBy("nation")
    )


SUPPLIER_PORTFOLIO_ORACLE = f"""
WITH cell AS (
  SELECT l_suppkey, p_type, SUM({_VOL_SQL}) AS _rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
),
stot AS (
  SELECT l_suppkey, SUM(_rev) AS _st, COUNT(*) AS n_types
  FROM cell GROUP BY 1
),
per_supp AS (
  SELECT c.l_suppkey, t.n_types,
         SUM(CAST(round(-(CAST(c._rev AS DOUBLE) / CAST(t._st AS DOUBLE))
                        * ln(CAST(c._rev AS DOUBLE) / CAST(t._st AS DOUBLE)),
                        9) AS DECIMAL(18,9))) AS _h
  FROM cell c JOIN stot t USING (l_suppkey)
  GROUP BY 1, 2
)
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       round(CAST(SUM(p.n_types) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
         AS mean_types_supplied,
       round(CAST(SUM(p._h) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
         AS mean_type_entropy_nats
FROM per_supp p
JOIN supplier s ON p.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1 ORDER BY 1
"""


def price_interaction_type_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way interaction audit on catalog pricing: mean retail
    price per (type class × size band) cell, with the ADDITIVE
    residual ``cell − row_mean − col_mean + grand_mean`` — a large
    |residual| means type and size interact (a PROMO premium that
    only exists at small sizes), which single-factor views like
    ``part_size_value_bands`` and ``retail_markup_by_type`` cannot
    see.

    Determinism: every mean is an exact DECIMAL sum over exact
    counts divided once in double; the residual is a four-term
    double chain rounded 9dp (identical IEEE ops both engines).

    Plan: ONE part-dim aggregate to ≤ |classes|×|bands| cells; row /
    column / grand means aggregate those cells and join back
    broadcast-sized."""
    part = load_table(spark, sf_dir, "part")
    cls = F.split(F.col("p_type"), " ").getItem(0)
    band = F.expr("p_size div 10")
    cell = part.groupBy(
        cls.alias("type_class"), band.alias("size_band")
    ).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(_dec("p_retailprice")).alias("_s"),
    )
    rowm = cell.groupBy("type_class").agg(
        (F.sum("_s").cast("double") / F.sum("n_parts").cast("double")).alias(
            "_rm"
        )
    )
    colm = cell.groupBy("size_band").agg(
        (F.sum("_s").cast("double") / F.sum("n_parts").cast("double")).alias(
            "_cm"
        )
    )
    grand = cell.agg(
        (F.sum("_s").cast("double") / F.sum("n_parts").cast("double")).alias(
            "_gm"
        )
    )
    cavg = F.col("_s").cast("double") / F.col("n_parts").cast("double")
    return (
        cell.join(F.broadcast(rowm), "type_class")
        .join(F.broadcast(colm), "size_band")
        .crossJoin(F.broadcast(grand))
        .select(
            "type_class",
            F.col("size_band").cast("int").alias("size_band"),
            "n_parts",
            F.round(cavg, 9).alias("cell_avg_price"),
            F.round(
                cavg - F.col("_rm") - F.col("_cm") + F.col("_gm"), 9
            ).alias("interaction_lift"),
        )
        .orderBy("type_class", "size_band")
    )


PRICE_INTERACTION_ORACLE = """
WITH cell AS (
  SELECT string_split(p_type, ' ')[1] AS type_class,
         p_size // 10 AS size_band,
         COUNT(*) AS n_parts,
         SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS _s
  FROM part GROUP BY 1, 2
),
rowm AS (
  SELECT type_class,
         CAST(SUM(_s) AS DOUBLE) / CAST(SUM(n_parts) AS DOUBLE) AS _rm
  FROM cell GROUP BY 1
),
colm AS (
  SELECT size_band,
         CAST(SUM(_s) AS DOUBLE) / CAST(SUM(n_parts) AS DOUBLE) AS _cm
  FROM cell GROUP BY 1
),
grand AS (
  SELECT CAST(SUM(_s) AS DOUBLE) / CAST(SUM(n_parts) AS DOUBLE) AS _gm
  FROM cell
)
SELECT c.type_class, CAST(c.size_band AS INT) AS size_band,
       CAST(c.n_parts AS BIGINT) AS n_parts,
       round(CAST(c._s AS DOUBLE) / CAST(c.n_parts AS DOUBLE), 9)
         AS cell_avg_price,
       round(CAST(c._s AS DOUBLE) / CAST(c.n_parts AS DOUBLE)
             - r._rm - m._cm + g._gm, 9) AS interaction_lift
FROM cell c
JOIN rowm r USING (type_class)
JOIN colm m USING (size_band)
CROSS JOIN grand g
ORDER BY c.type_class, c.size_band
"""


def supplier_share_trend_movers(
    spark: SparkSession, sf_dir: str, top_k: int = 10, min_quarters: int = 4
) -> DataFrame:
    """Share-shift movers: the ``top_k`` suppliers whose share of
    quarterly revenue is trending hardest (|OLS slope| of share over
    the quarter index) — the market-share early-warning list behind
    ``supplier_hhi``'s static concentration number.

    Determinism: quarterly shares are one double division of exact
    DECIMAL revenue sums rounded to 9; the regression uses the
    integer-x identity with Σxy/Σy as rounded-term DECIMALS and
    Σx/Σx² exact integers (the ``price_trend_slope_by_type``
    contract); top-k orders by (|slope| desc, suppkey asc).

    Plan: fact → (supplier, quarter) cells in one aggregate; quarter
    totals broadcast back; supplier-grain OLS rollup; a global top-k
    (TakeOrderedAndProject) — no window over fact rows."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    qidx = (
        (F.year("l_shipdate") - F.lit(1992)) * 4 + F.quarter("l_shipdate") - 1
    ).cast("long")
    cell = li.groupBy("l_suppkey", qidx.alias("x")).agg(
        F.sum(_vol()).alias("_rev")
    )
    qt = cell.groupBy("x").agg(F.sum("_rev").alias("_qt"))
    y = F.round(
        F.col("_rev").cast("double") / F.col("_qt").cast("double"), 9
    )
    xy = cell.join(F.broadcast(qt), "x").select(
        "l_suppkey",
        "x",
        F.round(F.col("x").cast("double") * y, 9)
        .cast("decimal(38,9)")
        .alias("_xy"),
        F.round(y, 9).cast("decimal(38,9)").alias("_y"),
    )
    agg = xy.groupBy("l_suppkey").agg(
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
    ranked = (
        agg.where(F.col("n_quarters") >= min_quarters)
        .select(
            "l_suppkey",
            "n_quarters",
            F.round(slope, 9).alias("share_slope"),
        )
        .orderBy(F.abs(F.col("share_slope")).desc(), "l_suppkey")
        .limit(top_k)
    )
    return (
        ranked.join(
            supp.select("s_suppkey", "s_name"),
            ranked["l_suppkey"] == F.col("s_suppkey"),
        )
        .select(
            F.col("l_suppkey").cast("long").alias("suppkey"),
            "s_name",
            "n_quarters",
            "share_slope",
        )
        .orderBy(F.abs(F.col("share_slope")).desc(), "suppkey")
    )


SUPPLIER_SHARE_TREND_ORACLE = f"""
WITH cell AS (
  SELECT l_suppkey,
         CAST((year(l_shipdate) - 1992) * 4 + quarter(l_shipdate) - 1
              AS BIGINT) AS x,
         SUM({_VOL_SQL}) AS _rev
  FROM lineitem GROUP BY 1, 2
),
qt AS (SELECT x, SUM(_rev) AS _qt FROM cell GROUP BY 1),
xy AS (
  SELECT c.l_suppkey, c.x,
         CAST(round(CAST(c.x AS DOUBLE)
                    * round(CAST(c._rev AS DOUBLE) / CAST(q._qt AS DOUBLE), 9),
                    9) AS DECIMAL(38,9)) AS _xy,
         CAST(round(CAST(c._rev AS DOUBLE) / CAST(q._qt AS DOUBLE), 9)
              AS DECIMAL(38,9)) AS _y
  FROM cell c JOIN qt q USING (x)
),
agg AS (
  SELECT l_suppkey, COUNT(*) AS n_quarters,
         SUM(x) AS _sx, SUM(x * x) AS _sxx,
         SUM(_xy) AS _sxy, SUM(_y) AS _sy
  FROM xy GROUP BY 1
),
ranked AS (
  SELECT l_suppkey, n_quarters,
         round((CAST(n_quarters AS DOUBLE) * CAST(_sxy AS DOUBLE)
                - CAST(_sx AS DOUBLE) * CAST(_sy AS DOUBLE))
               / (CAST(n_quarters AS DOUBLE) * CAST(_sxx AS DOUBLE)
                  - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE)), 9)
           AS share_slope
  FROM agg WHERE n_quarters >= 4
  ORDER BY abs(round((CAST(n_quarters AS DOUBLE) * CAST(_sxy AS DOUBLE)
                - CAST(_sx AS DOUBLE) * CAST(_sy AS DOUBLE))
               / (CAST(n_quarters AS DOUBLE) * CAST(_sxx AS DOUBLE)
                  - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE)), 9)) DESC,
           l_suppkey
  LIMIT 10
)
SELECT CAST(r.l_suppkey AS BIGINT) AS suppkey, s.s_name,
       CAST(r.n_quarters AS BIGINT) AS n_quarters, r.share_slope
FROM ranked r JOIN supplier s ON r.l_suppkey = s.s_suppkey
ORDER BY abs(r.share_slope) DESC, suppkey
"""


QUERIES = {
    "supplier_share_trend_movers": supplier_share_trend_movers,
    "price_interaction_type_size": price_interaction_type_size,
    "supplier_portfolio_diversity": supplier_portfolio_diversity,
    "reactivated_order_value_gap": reactivated_order_value_gap,
    "value_by_line_position": value_by_line_position,
    "part_name_term_premium": part_name_term_premium,
    "quarter_end_loading": quarter_end_loading,
}

ORACLES = {
    "supplier_share_trend_movers": SUPPLIER_SHARE_TREND_ORACLE,
    "price_interaction_type_size": PRICE_INTERACTION_ORACLE,
    "supplier_portfolio_diversity": SUPPLIER_PORTFOLIO_ORACLE,
    "reactivated_order_value_gap": REACTIVATED_ORDER_VALUE_ORACLE,
    "value_by_line_position": VALUE_BY_LINE_POSITION_ORACLE,
    "part_name_term_premium": PART_NAME_TERM_PREMIUM_ORACLE,
    "quarter_end_loading": QUARTER_END_LOADING_ORACLE,
}
