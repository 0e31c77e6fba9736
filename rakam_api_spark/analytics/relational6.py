"""Round-14 relational additions: customer priority-escalation
transitions, substitutable-part pairs, value inequality (Theil),
weekday revenue drift, brand supply concentration, and ship-latency
bands — warehouse-SQL report shapes the reference serves through its
ad-hoc query service (reference README.md:17,27-31; SURVEY.md §2.7),
expressed as declarative DataFrame plans.

Determinism conventions match relational.py: money through
DECIMAL(18,6); single ratios are one double division rounded to 9dp;
ln()-chains (Theil, HHI sums over per-key cells) round to 6dp (the
zipf_slope_by_source convention — cross-engine ulp drift ≪ 5e-7);
every ordering ends in a unique key; date math is exact integer day
arithmetic.

Scale notes (the r13 watch-item convention): dimension joins carry NO
forced broadcast hint — part/supplier/customer grow with SF, so the
build side is left to AQE's runtime size check.  Every query reduces
the fact table with ONE aggregate (or one user/customer-keyed window)
before any small-grain arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from .relational import DEC, _dec
from .relational2 import _VOL_SQL, _vol
from .relational4 import _MONDAY, _dow


def priority_escalation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority transition matrix: for every customer's
    consecutive order pair (by order date, orderkey tiebreak), count
    transitions ``from_priority → to_priority`` and each row's share
    of its from-priority — "do urgent customers stay urgent?", the
    order-grain Markov analog of ``customer_migration_matrix``.

    Plan: ONE customer-keyed lag window over orders (the only fact
    exchange), then an enum-sized (5×5) cell aggregate; shares are
    aggregates OF those cells joined back broadcast-sized."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        F.lag("o_orderpriority").over(w).alias("from_priority"),
        F.col("o_orderpriority").alias("to_priority"),
    ).where(F.col("from_priority").isNotNull())
    cell = seq.groupBy("from_priority", "to_priority").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    rowtot = cell.groupBy("from_priority").agg(
        F.sum("n_transitions").alias("_row_n")
    )
    return (
        cell.join(F.broadcast(rowtot), "from_priority")
        .select(
            "from_priority",
            "to_priority",
            "n_transitions",
            F.round(
                F.col("n_transitions").cast("double")
                / F.col("_row_n").cast("double"),
                9,
            ).alias("share_of_from"),
        )
        .orderBy("from_priority", "to_priority")
    )


PRIORITY_ESCALATION_ORACLE = """
WITH seq AS (
  SELECT lag(o_orderpriority) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS from_priority,
         o_orderpriority AS to_priority
  FROM orders
),
cell AS (
  SELECT from_priority, to_priority, COUNT(*) AS n_transitions
  FROM seq WHERE from_priority IS NOT NULL GROUP BY 1, 2
),
rowtot AS (
  SELECT from_priority, SUM(n_transitions) AS _row_n FROM cell GROUP BY 1
)
SELECT c.from_priority, c.to_priority,
       CAST(c.n_transitions AS BIGINT) AS n_transitions,
       round(CAST(c.n_transitions AS DOUBLE) / CAST(r._row_n AS DOUBLE), 9)
         AS share_of_from
FROM cell c JOIN rowtot r USING (from_priority)
ORDER BY c.from_priority, c.to_priority
"""


def part_substitution_candidates(
    spark: SparkSession, sf_dir: str, max_gap: float = 0.02, per_cell: int = 3
) -> DataFrame:
    """Substitutable-part pairs: within each (type, size) cell, part
    pairs whose retail prices sit within ``max_gap`` of the cheaper
    one — the assortment-rationalization shortlist ("these two SKUs
    compete with themselves").  At most ``per_cell`` pairs per cell,
    closest-priced first.

    Plan: a DIMENSION-grain BANDED self-join (never touches a fact
    table): prices bucket at δ = max_gap·max(price), so a qualifying
    pair's buckets differ by at most 1 — the left side probes
    {b−1, b, b+1} and the join is a plain equi-join on (type, size,
    bucket).  Candidates are adjacent-bucket only (the quadratic
    within-cell blowup of a bare (type, size) self-join never
    materializes as the catalog grows); the exact gap filter then
    makes the output identical to the naive pairing.  The per-cell
    rank window sorts only surviving pairs."""
    part = load_table(spark, sf_dir, "part")
    mx = part.agg(F.max("p_retailprice").alias("_mx"))
    pb = part.crossJoin(F.broadcast(mx)).withColumn(
        "_bkt", F.floor(F.col("p_retailprice") / (F.col("_mx") * max_gap))
    )
    probe = pb.withColumn(
        "_bkt", F.explode(F.array(F.col("_bkt") - 1, F.col("_bkt"), F.col("_bkt") + 1))
    )
    a = probe.alias("a")
    b = pb.alias("b")
    lo = F.least(F.col("a.p_retailprice"), F.col("b.p_retailprice"))
    hi = F.greatest(F.col("a.p_retailprice"), F.col("b.p_retailprice"))
    gap = (hi - lo) / lo
    pairs = (
        a.join(
            b,
            (F.col("a.p_type") == F.col("b.p_type"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a._bkt") == F.col("b._bkt"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_type").alias("p_type"),
            F.col("a.p_size").alias("p_size"),
            F.col("a.p_partkey").alias("part1"),
            F.col("b.p_partkey").alias("part2"),
            F.col("a.p_retailprice").alias("price1"),
            F.col("b.p_retailprice").alias("price2"),
            gap.alias("_gap"),
        )
        .where(F.col("_gap") <= max_gap)
    )
    w = Window.partitionBy("p_type", "p_size").orderBy(
        "_gap", "part1", "part2"
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= per_cell)
        .select(
            "p_type",
            "p_size",
            "part1",
            "part2",
            "price1",
            "price2",
            F.round(F.col("_gap"), 9).alias("gap_pct"),
            "rnk",
        )
        .orderBy("p_type", "p_size", "rnk")
    )


PART_SUBSTITUTION_ORACLE = """
WITH pairs AS (
  SELECT a.p_type, a.p_size,
         a.p_partkey AS part1, b.p_partkey AS part2,
         a.p_retailprice AS price1, b.p_retailprice AS price2,
         (greatest(a.p_retailprice, b.p_retailprice)
          - least(a.p_retailprice, b.p_retailprice))
           / least(a.p_retailprice, b.p_retailprice) AS _gap
  FROM part a JOIN part b
    ON a.p_type = b.p_type AND a.p_size = b.p_size
   AND a.p_partkey < b.p_partkey
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY p_type, p_size ORDER BY _gap, part1, part2
         ) AS INT) AS rnk
  FROM pairs WHERE _gap <= 0.02
)
SELECT p_type, CAST(p_size AS INT) AS p_size, part1, part2,
       price1, price2, round(_gap, 9) AS gap_pct, rnk
FROM ranked WHERE rnk <= 3
ORDER BY p_type, p_size, rnk
"""


def order_value_theil_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-value inequality by market segment: the Theil T index
    ``mean((x/μ)·ln(x/μ))`` over each segment's order values — the
    decomposable inequality measure that complements
    ``customer_gini_by_segment`` (Theil is additive across
    subgroups; Gini is not).

    Plan: orders⋈customer is an un-hinted equi-join (AQE picks the
    build side — customer grows with SF, r13 watch #3 convention);
    segment means are a 5-row aggregate broadcast back; the per-order
    ln-term sum collapses map-side.  ln-chain → round 6."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    seg = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_totalprice").alias("x"),
    )
    means = seg.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum(_dec("x")) / F.count(F.lit(1))).cast("double").alias("_mu"),
    )
    ratio = F.col("x") / F.col("_mu")
    return (
        seg.join(F.broadcast(means), "segment")
        .groupBy("segment", "n_orders")
        .agg(
            F.round(
                (F.sum(ratio * F.log(ratio)) / F.col("n_orders").cast("double")).cast(
                    "double"
                ),
                6,
            ).alias("theil_t")
        )
        .select("segment", "n_orders", "theil_t")
        .orderBy("segment")
    )


ORDER_THEIL_ORACLE = """
WITH seg AS (
  SELECT c.c_mktsegment AS segment, o.o_totalprice AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
means AS (
  SELECT segment, COUNT(*) AS n_orders,
         CAST(SUM(CAST(x AS DECIMAL(18,6))) / COUNT(*) AS DOUBLE) AS _mu
  FROM seg GROUP BY 1
)
SELECT s.segment, CAST(m.n_orders AS BIGINT) AS n_orders,
       round(SUM((s.x / m._mu) * ln(s.x / m._mu))
             / CAST(m.n_orders AS DOUBLE), 6) AS theil_t
FROM seg s JOIN means m USING (segment)
GROUP BY s.segment, m.n_orders
ORDER BY s.segment
"""


def weekday_revenue_share_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weekday revenue-mix stability: each weekday's share of its
    year's order value, summarized per weekday as the min/max share
    across years and the drift (max − min) — "is the Monday share of
    revenue moving?", the calendar-mix control chart.

    Plan: one fact aggregate to (year × dow) cells (≤ 7·years rows);
    year totals aggregate those cells; everything after is arithmetic
    on an enum-sized frame.  Shares are single double divisions of
    exact DECIMAL sums (round 9)."""
    orders = load_table(spark, sf_dir, "orders")
    cell = orders.groupBy(
        F.year(F.col("o_orderdate").cast("date")).alias("yr"),
        _dow(F.col("o_orderdate")).alias("dow"),
    ).agg(F.sum(_dec("o_totalprice")).alias("_val"))
    ytot = cell.groupBy("yr").agg(F.sum("_val").alias("_yt"))
    share = (
        cell.join(F.broadcast(ytot), "yr")
        .select(
            "dow",
            "yr",
            (F.col("_val").cast("double") / F.col("_yt").cast("double")).alias(
                "_share"
            ),
        )
    )
    return (
        share.groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n_years"),
            F.round(F.min("_share"), 9).alias("min_share"),
            F.round(F.max("_share"), 9).alias("max_share"),
            F.round(F.max("_share") - F.min("_share"), 9).alias("drift"),
        )
        .orderBy("dow")
    )


WEEKDAY_DRIFT_ORACLE = f"""
WITH cell AS (
  SELECT year(CAST(o_orderdate AS DATE)) AS yr,
         CAST(((date_diff('day', DATE '{_MONDAY}', CAST(o_orderdate AS DATE))
                % 7 + 7) % 7 + 1) AS INT) AS dow,
         SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS _val
  FROM orders GROUP BY 1, 2
),
ytot AS (SELECT yr, SUM(_val) AS _yt FROM cell GROUP BY 1),
share AS (
  SELECT c.dow, c.yr, CAST(c._val AS DOUBLE) / CAST(y._yt AS DOUBLE) AS _share
  FROM cell c JOIN ytot y USING (yr)
)
SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_years,
       round(MIN(_share), 9) AS min_share,
       round(MAX(_share), 9) AS max_share,
       round(MAX(_share) - MIN(_share), 9) AS drift
FROM share GROUP BY dow ORDER BY dow
"""


def brand_supplier_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Supply-base concentration per brand: distinct suppliers, the
    top supplier's revenue share, and the Herfindahl index of
    supplier shares within the brand — the sourcing-risk view of
    ``supplier_dependency_risk`` turned around to brand grain.

    Plan: lineitem⋈part is an un-hinted equi-join (AQE build-side);
    ONE fact aggregate to (brand, supplier) cells, then a brand-grain
    rollup of those cells.  Shares from exact DECIMAL sums; the HHI
    sums squared divisions over a brand's suppliers (ln-chain class →
    round 6)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cell = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"), "l_suppkey")
        .agg(F.sum(_vol()).alias("_rev"))
    )
    btot = cell.groupBy("brand").agg(
        F.sum("_rev").alias("_bt"),
        F.count(F.lit(1)).alias("n_suppliers"),
        F.max("_rev").alias("_top"),
    )
    share = F.col("_rev").cast("double") / F.col("_bt").cast("double")
    return (
        cell.join(F.broadcast(btot), "brand")
        .groupBy("brand", "n_suppliers")
        .agg(
            F.round(F.sum(share * share), 6).alias("hhi"),
            F.round(
                F.max(F.col("_top").cast("double") / F.col("_bt").cast("double")),
                9,
            ).alias("top_supplier_share"),
        )
        .select("brand", "n_suppliers", "hhi", "top_supplier_share")
        .orderBy("brand")
    )


BRAND_SUPPLIER_CONC_ORACLE = f"""
WITH cell AS (
  SELECT p.p_brand AS brand, l.l_suppkey, SUM({_VOL_SQL}) AS _rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
btot AS (
  SELECT brand, SUM(_rev) AS _bt, COUNT(*) AS n_suppliers,
         MAX(_rev) AS _top
  FROM cell GROUP BY 1
)
SELECT c.brand, CAST(b.n_suppliers AS BIGINT) AS n_suppliers,
       round(SUM((CAST(c._rev AS DOUBLE) / CAST(b._bt AS DOUBLE))
                 * (CAST(c._rev AS DOUBLE) / CAST(b._bt AS DOUBLE))), 6)
         AS hhi,
       round(MAX(CAST(b._top AS DOUBLE) / CAST(b._bt AS DOUBLE)), 9)
         AS top_supplier_share
FROM cell c JOIN btot b USING (brand)
GROUP BY c.brand, b.n_suppliers
ORDER BY c.brand
"""


def ship_gap_bands_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ship-latency bands by order priority: days between order date
    and line ship date, bucketed into 15-day bands clamped to
    [-1, 8] (band -1 collects shipped-before-ordered rows — a
    data-quality band the synthetic generator does produce), with
    each band's share of its priority — "does URGENT actually ship
    faster?", the SLA-verification grid.

    Plan: lineitem⋈orders is the fact-fact equi-join on the natural
    key (bucketed co-location at warehouse scale, AQE skew-join
    otherwise); ONE aggregate to the ≤ 5×9 enum grid; shares are
    cell-aggregate divisions.  Day math is exact integer datediff."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    gap = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    band = F.greatest(F.least(F.floor(gap / 15), F.lit(8)), F.lit(-1)).cast(
        "int"
    )
    cell = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            band.alias("gap_band"),
        )
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    ptot = cell.groupBy("priority").agg(F.sum("n_lines").alias("_pn"))
    return (
        cell.join(F.broadcast(ptot), "priority")
        .select(
            "priority",
            "gap_band",
            "n_lines",
            F.round(
                F.col("n_lines").cast("double") / F.col("_pn").cast("double"), 9
            ).alias("share_of_priority"),
        )
        .orderBy("priority", "gap_band")
    )


SHIP_GAP_BANDS_ORACLE = """
WITH cell AS (
  SELECT o.o_orderpriority AS priority,
         CAST(greatest(least(CAST(floor(date_diff('day',
                                CAST(o.o_orderdate AS DATE),
                                CAST(l.l_shipdate AS DATE)) / 15)
                         AS BIGINT), 8), -1) AS INT) AS gap_band,
         COUNT(*) AS n_lines
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
ptot AS (SELECT priority, SUM(n_lines) AS _pn FROM cell GROUP BY 1)
SELECT c.priority, c.gap_band, CAST(c.n_lines AS BIGINT) AS n_lines,
       round(CAST(c.n_lines AS DOUBLE) / CAST(p._pn AS DOUBLE), 9)
         AS share_of_priority
FROM cell c JOIN ptot p USING (priority)
ORDER BY c.priority, c.gap_band
"""


QUERIES = {
    "priority_escalation_matrix": priority_escalation_matrix,
    "part_substitution_candidates": part_substitution_candidates,
    "order_value_theil_by_segment": order_value_theil_by_segment,
    "weekday_revenue_share_drift": weekday_revenue_share_drift,
    "brand_supplier_concentration": brand_supplier_concentration,
    "ship_gap_bands_by_priority": ship_gap_bands_by_priority,
}

ORACLES = {
    "priority_escalation_matrix": PRIORITY_ESCALATION_ORACLE,
    "part_substitution_candidates": PART_SUBSTITUTION_ORACLE,
    "order_value_theil_by_segment": ORDER_THEIL_ORACLE,
    "weekday_revenue_share_drift": WEEKDAY_DRIFT_ORACLE,
    "brand_supplier_concentration": BRAND_SUPPLIER_CONC_ORACLE,
    "ship_gap_bands_by_priority": SHIP_GAP_BANDS_ORACLE,
}


def realized_vs_retail_by_discount(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Realized-to-retail price ratio per discount band: how much of
    catalog (retail) value each discount tier actually collects —
    the pricing-leakage waterfall behind ``discount_elasticity``'s
    volume view (value realization here, quantity response there).

    Plan: un-hinted lineitem⋈part equi-join (AQE build side), ONE
    aggregate to ≤ 11 discount-percent cells (integer band =
    round(discount·100)); value sums DECIMAL; the ratio is one double
    division rounded to 9dp."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    band = F.round(F.col("l_discount") * 100, 0).cast("int")
    cell = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy(band.alias("discount_pct"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
            ).alias("_realized"),
            F.sum(
                (F.col("p_retailprice") * F.col("l_quantity")).cast(DEC)
            ).alias("_retail"),
        )
    )
    return cell.select(
        "discount_pct",
        "n_lines",
        F.col("_realized").cast("double").alias("realized_value"),
        F.col("_retail").cast("double").alias("retail_value"),
        F.round(
            F.col("_realized").cast("double") / F.col("_retail").cast("double"),
            9,
        ).alias("realization_ratio"),
    ).orderBy("discount_pct")


REALIZED_VS_RETAIL_ORACLE = """
WITH cell AS (
  SELECT CAST(round(l.l_discount * 100, 0) AS INT) AS discount_pct,
         COUNT(*) AS n_lines,
         SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
           AS _realized,
         SUM(CAST(p.p_retailprice * l.l_quantity AS DECIMAL(18,6)))
           AS _retail
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1
)
SELECT discount_pct, CAST(n_lines AS BIGINT) AS n_lines,
       CAST(_realized AS DOUBLE) AS realized_value,
       CAST(_retail AS DOUBLE) AS retail_value,
       round(CAST(_realized AS DOUBLE) / CAST(_retail AS DOUBLE), 9)
         AS realization_ratio
FROM cell ORDER BY discount_pct
"""


def supplier_nation_price_advantage(
    spark: SparkSession, sf_dir: str, min_lines: int = 20
) -> DataFrame:
    """Unit-price advantage by supplier nation and part type: each
    (nation, type) cell's average unit price against the type's
    global average — "which nations undercut the market for this
    type?", the sourcing-arbitrage screen.  Cells under ``min_lines``
    are dropped (unstable averages).

    Plan: un-hinted lineitem⋈supplier join, broadcast-sized nation
    dim; ONE fact aggregate to (nation, type) cells after the part
    join; type globals aggregate THOSE cells.  Unit prices are double
    divisions of exact DECIMAL sums (round 9)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    cell = (
        li.join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("n_name").alias("nation"), F.col("p_type").alias("p_type"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(_dec("l_extendedprice")).alias("_val"),
            F.sum(_dec("l_quantity")).alias("_qty"),
        )
    )
    ttot = cell.groupBy("p_type").agg(
        F.sum("_val").alias("_tval"), F.sum("_qty").alias("_tqty")
    )
    unit = F.col("_val").cast("double") / F.col("_qty").cast("double")
    gunit = F.col("_tval").cast("double") / F.col("_tqty").cast("double")
    return (
        cell.where(F.col("n_lines") >= min_lines)
        .join(F.broadcast(ttot), "p_type")
        .select(
            "nation",
            "p_type",
            "n_lines",
            F.round(unit, 9).alias("unit_price"),
            F.round(gunit, 9).alias("type_unit_price"),
            F.round(unit / gunit, 9).alias("price_advantage"),
        )
        .orderBy("nation", "p_type")
    )


NATION_PRICE_ADVANTAGE_ORACLE = """
WITH cell AS (
  SELECT n.n_name AS nation, p.p_type,
         COUNT(*) AS n_lines,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS _val,
         SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS _qty
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
ttot AS (
  SELECT p_type, SUM(_val) AS _tval, SUM(_qty) AS _tqty
  FROM cell GROUP BY 1
)
SELECT c.nation, c.p_type, CAST(c.n_lines AS BIGINT) AS n_lines,
       round(CAST(c._val AS DOUBLE) / CAST(c._qty AS DOUBLE), 9)
         AS unit_price,
       round(CAST(t._tval AS DOUBLE) / CAST(t._tqty AS DOUBLE), 9)
         AS type_unit_price,
       round((CAST(c._val AS DOUBLE) / CAST(c._qty AS DOUBLE))
             / (CAST(t._tval AS DOUBLE) / CAST(t._tqty AS DOUBLE)), 9)
         AS price_advantage
FROM cell c JOIN ttot t USING (p_type)
WHERE c.n_lines >= 20
ORDER BY c.nation, c.p_type
"""


def brand_quarter_share_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand revenue-mix stability across quarters: each brand's
    share of its quarter's lineitem revenue, summarized per brand as
    min/max share and the shift (max − min) — the brand-level
    companion to ``weekday_revenue_share_drift`` (assortment mix
    moving vs calendar mix moving).

    Plan: un-hinted lineitem⋈part join; ONE aggregate to (quarter ×
    brand) cells (enum × calendar-bounded); quarter totals aggregate
    those cells; shares are single double divisions of DECIMAL sums."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ship = F.col("l_shipdate").cast("date")
    quarter = (F.year(ship) * 4 + F.quarter(ship) - 1).alias("qtr")
    cell = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"), quarter)
        .agg(F.sum(_vol()).alias("_rev"))
    )
    qtot = cell.groupBy("qtr").agg(F.sum("_rev").alias("_qt"))
    share = (
        cell.join(F.broadcast(qtot), "qtr")
        .select(
            "brand",
            "qtr",
            (F.col("_rev").cast("double") / F.col("_qt").cast("double")).alias(
                "_share"
            ),
        )
    )
    return (
        share.groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n_quarters"),
            F.round(F.min("_share"), 9).alias("min_share"),
            F.round(F.max("_share"), 9).alias("max_share"),
            F.round(F.max("_share") - F.min("_share"), 9).alias("shift"),
        )
        .orderBy("brand")
    )


BRAND_QUARTER_SHIFT_ORACLE = f"""
WITH cell AS (
  SELECT p.p_brand AS brand,
         year(CAST(l.l_shipdate AS DATE)) * 4
           + quarter(CAST(l.l_shipdate AS DATE)) - 1 AS qtr,
         SUM({_VOL_SQL}) AS _rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
qtot AS (SELECT qtr, SUM(_rev) AS _qt FROM cell GROUP BY 1),
share AS (
  SELECT c.brand, c.qtr,
         CAST(c._rev AS DOUBLE) / CAST(q._qt AS DOUBLE) AS _share
  FROM cell c JOIN qtot q USING (qtr)
)
SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_quarters,
       round(MIN(_share), 9) AS min_share,
       round(MAX(_share), 9) AS max_share,
       round(MAX(_share) - MIN(_share), 9) AS shift
FROM share GROUP BY brand ORDER BY brand
"""


QUERIES.update(
    {
        "realized_vs_retail_by_discount": realized_vs_retail_by_discount,
        "supplier_nation_price_advantage": supplier_nation_price_advantage,
        "brand_quarter_share_shift": brand_quarter_share_shift,
    }
)

ORACLES.update(
    {
        "realized_vs_retail_by_discount": REALIZED_VS_RETAIL_ORACLE,
        "supplier_nation_price_advantage": NATION_PRICE_ADVANTAGE_ORACLE,
        "brand_quarter_share_shift": BRAND_QUARTER_SHIFT_ORACLE,
    }
)
