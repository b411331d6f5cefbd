"""Physical-plan guards for the M13 tier — the 100 TB claims each
operator's docstring makes, pinned on the executed plan text."""

from __future__ import annotations

import __spark_entry__ as se

# sf0.001, NOT sf0.01: these tests prime the shared fact cache for
# whatever sf_dir they touch, and test_plan_properties asserts column
# pruning on a FRESH sf0.01 scan — a pre-existing sf0.01 cache would
# substitute itself into that plan and widen its ReadSchema. The plan
# shapes asserted here are scale-independent.
SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = se.queries()[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_heavy_hitters_candidates_broadcast(spark):
    """The exact recount joins against the MG candidate set via
    BROADCAST — the full-cardinality groupBy the operator exists to
    avoid must not appear before the candidate filter."""
    plan = _plan(spark, "heavy_hitters_exact")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_setsim_no_cartesian(spark):
    """Candidate generation is an equi-join on prefix shingles — never
    a cartesian/broadcast-nested-loop over document pairs."""
    plan = _plan(spark, "setsim_prefix_pairs")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_source_token_caps_windows_are_partitioned(spark):
    """Both prefix-sum windows carry a partition spec: the within-
    bucket window on (source, bucket), the bucket-summary window on
    (source). No empty-partition (global) window may appear — that is
    exactly the single-task sort the two-level shape removes."""
    plan = _plan(spark, "source_token_caps")
    for ln in plan.splitlines():
        if "partitionBy=" in ln:
            assert "partitionBy=[]" not in ln, ln
    # and the window partition keys are the documented ones
    assert "source" in plan and "_b" in plan, plan


def test_spikes_window_partitioned_by_client(spark):
    plan = _plan(spark, "client_daily_spikes")
    for ln in plan.splitlines():
        if "partitionBy=" in ln:
            assert "partitionBy=[]" not in ln, ln


def test_first_seen_is_two_aggregates_no_window(spark):
    """min(date)-per-domain then count-per-date: partial-aggregable
    all the way; no window operator in the plan at all."""
    plan = _plan(spark, "first_seen_domains")
    assert "Window" not in plan, plan
    assert plan.count("HashAggregate") >= 2, plan
