"""Plan guards for the robust tier: per-client medians must run in
CLIENT-PARTITIONED windows (no global funnel), and every day-grain
operator must aggregate the fact before any window."""

from __future__ import annotations

import re

from piholelongtermstats_spark.operators import robust
from tests.conftest import make_fact


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _fact(spark):
    rows = [
        (i, f"2024-01-{(i % 9) + 1:02d}T10:00:00", f"c{i % 3}", "d",
         "Allowed", None)
        for i in range(30)
    ]
    return make_fact(spark, rows)


def test_client_mad_windows_are_client_partitioned(spark):
    plan = _plan(robust.client_mad_outliers(_fact(spark)))
    windows = [l for l in plan.splitlines() if re.search(r"\bWindow \[", l)]
    assert windows, "expected Window nodes in the per-client plan"
    for line in windows:
        assert "client#" in line, f"unpartitioned window: {line.strip()}"


def test_day_grain_ops_aggregate_before_window(spark):
    """tukey/mad/theil-sen: the first thing after the scan is the
    per-day HashAggregate; windows consume its output, so the only
    rows any window ever orders are day rows."""
    fact = _fact(spark)
    for df in (
        robust.tukey_fence_days(fact),
        robust.mad_outlier_days(fact),
        robust.theil_sen_daily_trend(fact),
    ):
        plan = _plan(df)
        assert "HashAggregate" in plan
        # the fold-based ops have no WindowExec at all
    ewma_plan = _plan(robust.ewma_daily_counts(fact))
    assert "Window " not in ewma_plan  # pure fold: agg + explode only


def test_ewma_by_client_is_one_grouped_fold(spark):
    """Per-client EWMA: one shuffle to group day structs per client,
    no WindowExec, no per-client sort of event rows."""
    daily = robust._daily(_fact(spark))  # day grain only for shape
    from pyspark.sql import functions as F

    per_client = (
        _fact(spark)
        .groupBy("client", "date")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    plan = _plan(robust.ewma_by_client(per_client))
    assert "Window " not in plan
    assert plan.count("Exchange") <= 3  # fact agg + client regroup (+AQE reads)
    assert daily.count() > 0
