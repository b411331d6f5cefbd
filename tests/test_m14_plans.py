"""Physical-plan guards for the M14 TPC-H completion wave — each
query's docstring makes a scale claim; these pin it on the executed
plan text."""

from __future__ import annotations

import __spark_entry__ as se

# sf0.001 for the same reason as test_m13_plans: plan shapes are
# scale-independent and sf0.01 fact-cache priming breaks
# test_plan_properties' fresh-scan pruning assertion.
SF = "/root/testdata/sf0.001"

M14 = [
    "product_profit_by_nation",
    "late_shipment_priority",
    "promo_revenue_share",
    "top_revenue_supplier",
    "large_volume_customers",
    "brand_disjunction_revenue",
    "inactive_customer_balance",
]


def _plan(spark, name: str) -> str:
    df = se.queries()[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _analyzed(spark, name: str) -> str:
    df = se.queries()[name](spark, SF)
    return str(df._jdf.queryExecution().analyzed())


def test_no_cartesian_anywhere(spark):
    """None of the seven join trees may degrade to CartesianProduct.
    (The 1-row scalar-stats broadcast in Q22 is a BroadcastNestedLoop
    against a single row — allowed, asserted separately.)"""
    for name in M14:
        assert "CartesianProduct" not in _plan(spark, name), name


def test_q9_broadcast_pins_nation_only(spark):
    """Only the true dim (nation) carries a broadcast hint; the
    part/supplier/orders edges must stay unhinted for AQE (they scale
    with SF)."""
    analyzed = _analyzed(spark, "product_profit_by_nation")
    assert analyzed.count("ResolvedHint") == 1, analyzed


def test_q9_like_filter_reaches_part_scan(spark):
    """The LIKE cut prunes part before the fact join: the plan holds
    a Contains('widget') filter, and no Window appears anywhere."""
    plan = _plan(spark, "product_profit_by_nation")
    assert "widget" in plan, plan
    assert "Window" not in plan, plan


def test_q15_argmax_is_join_not_window(spark):
    """The Q15 argmax must be the broadcast max-equality join — a
    window/rank over the supplier relation would global-sort it."""
    plan = _plan(spark, "top_revenue_supplier")
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_q18_filters_before_join_and_takeordered(spark):
    """The qty>300 cut runs inside the aggregate (HAVING shape) before
    any join back, and the global order is TakeOrderedAndProject over
    the survivor set, never a total sort."""
    plan = _plan(spark, "large_volume_customers")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan
    # the decimal-sum filter appears below (after) the first aggregate
    assert plan.count("HashAggregate") >= 2, plan


def test_q22_anti_join_present(spark):
    """The recency cut is a left_anti join; the scalar gate's 1-row
    stats relation arrives via broadcast."""
    plan = _plan(spark, "inactive_customer_balance")
    assert "LeftAnti" in plan, plan
    assert "Broadcast" in plan, plan


def test_aggregates_are_partial_final(spark):
    """Every M14 aggregation keeps map-side partial aggregation (two
    HashAggregate levels) — nothing collapses to a single global agg
    without a map-side combine."""
    for name in ("late_shipment_priority", "promo_revenue_share",
                 "brand_disjunction_revenue"):
        plan = _plan(spark, name)
        assert plan.count("HashAggregate") >= 2, (name, plan)
