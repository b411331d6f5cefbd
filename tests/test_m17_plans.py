"""Physical-plan guards for the M17 TPC-H completion wave (Q6 / Q11 /
Q13 / Q17 / Q20 / Q21) — each query's docstring makes a scale claim;
these pin it on the executed plan text."""

from __future__ import annotations

import __spark_entry__ as se

# sf0.001: plan shapes are scale-independent, and sf0.01 fact-cache
# priming breaks test_plan_properties' fresh-scan pruning assertion.
SF = "/root/testdata/sf0.001"

M17 = [
    "forecast_revenue_change",
    "important_parts",
    "customer_order_distribution",
    "small_qty_order_revenue",
    "promo_part_suppliers",
    "waiting_suppliers",
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
    """No M17 join tree may degrade to CartesianProduct. (Q11's 1-row
    global-total gate is a BroadcastNestedLoop against a single row —
    allowed, asserted separately.)"""
    for name in M17:
        assert "CartesianProduct" not in _plan(spark, name), name


def test_q6_predicates_reach_scan_and_no_join(spark):
    """Q6 is the pushdown benchmark: the ship window and quantity cut
    must reach PushedFilters on the lineitem scan, and the plan has no
    join and no window — scan → filter → two-phase agg only."""
    plan = _plan(spark, "forecast_revenue_change")
    assert "PushedFilters" in plan, plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "l_shipdate" in pushed and "l_quantity" in pushed, pushed
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan


def test_q11_scalar_gate_is_single_row_broadcast(spark):
    """The global total joins back over its own input as a 1-row
    broadcast (BroadcastNestedLoop), never a shuffle; no window
    computes the total."""
    plan = _plan(spark, "important_parts")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "Window" not in plan, plan


def test_q13_outer_join_with_on_side_predicate(spark):
    """The priority exclusion must live in the LEFT join's ON clause —
    the analyzed plan keeps LeftOuter (a WHERE would have let Catalyst
    rewrite it Inner, dropping zero-order customers)."""
    analyzed = _analyzed(spark, "customer_order_distribution")
    assert "LeftOuter" in analyzed, analyzed
    plan = _plan(spark, "customer_order_distribution")
    assert plan.count("HashAggregate") >= 2, plan


def test_q17_join_back_is_broadcast_no_window(spark):
    """The per-part avg threshold is an aggregate joined back via
    broadcast (both sides carry the same brand cut, so the agg side is
    tiny); a Window over the fact would be the anti-pattern."""
    plan = _plan(spark, "small_qty_order_revenue")
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan


def test_q20_semi_join_chain(spark):
    """The qualifying-supplier key set drives a LEFT SEMI into
    supplier — the fact is never joined to the supplier dim."""
    plan = _plan(spark, "promo_part_suppliers")
    assert "LeftSemi" in plan, plan


def test_q21_scans_lineitem_once(spark):
    """The EXISTS/NOT-EXISTS reformulation's whole point: the textbook
    plan scans lineitem three times (self-join twice); the aggregate
    form scans it exactly once and needs no window."""
    plan = _plan(spark, "waiting_suppliers")
    assert plan.count("lineitem.parquet") == 1, plan
    assert "Window" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
