"""Plan-shape assertions for the second TPC-H sweep (relational2):
the correctness gate proves values; these prove the plans keep their
scale-critical shapes (TakeOrderedAndProject top-k, broadcast dims,
no unpartitioned WindowExec, anti-join for NOT IN)."""

from pyspark.sql import functions as F

from rakam_api_spark.analytics import relational2 as r2

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q10_top20_is_take_ordered(spark):
    plan = _plan(r2.q10_returned_items(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan  # no single-partition global window


def test_q2_top100_is_take_ordered_with_broadcast_min(spark):
    plan = _plan(r2.q2_min_cost_supplier(spark, SF))
    assert "TakeOrderedAndProject" in plan
    # the per-part MIN joins back via broadcast, never a per-row subquery
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_q16_not_in_is_broadcast_anti_join(spark):
    plan = _plan(r2.q16_part_supplier_counts(spark, SF))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_q19_disjunction_is_single_join_no_union(spark):
    """The three OR branches share the partkey equi-join; the plan
    must be one broadcast join with a residual disjunctive filter,
    not a union of three scans."""
    plan = _plan(r2.q19_disjunctive_revenue(spark, SF))
    assert "Union" not in plan
    assert plan.count("BroadcastHashJoin") == 1


def test_q17_threshold_join_is_broadcast(spark):
    plan = _plan(r2.q17_small_qty_revenue(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_q13_preserves_zero_order_customers(spark):
    """The left join must keep customers with no qualifying orders:
    the count distribution covers every customer exactly once."""
    dist = r2.q13_order_distribution(spark, SF).agg(F.sum("custdist")).collect()[0][0]
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert dist == n_cust


def test_q15_returns_the_max_revenue_supplier(spark):
    rows = r2.q15_top_supplier(spark, SF).collect()
    assert len(rows) >= 1
    assert all(r.total_revenue == rows[0].total_revenue for r in rows)
